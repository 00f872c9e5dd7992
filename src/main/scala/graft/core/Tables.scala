package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central catalog for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) and loads
  * parquet from it. Loading goes through here so that scale-oriented reader
  * options (pruning, pushdown) are applied uniformly. At cluster scale these
  * would be external catalog tables; the API surface is the same.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-lifetime parquet SCHEMA memo, keyed (sfDir, table).
    *
    * `spark.read.parquet(path)` infers the schema eagerly — a footer
    * read plus datasource resolution that measured ~110 ms PER CALL at
    * sf0.1 (vs ~13 ms with an explicit schema); every catalog entry
    * pays it 1-3 times, which summed to tens of seconds across a
    * 270-entry bench run. A real deployment gets the schema from the
    * catalog/metastore instead of re-deriving it per query — this memo
    * is that, scoped to the JVM. Metadata only (a few hundred bytes
    * per table): no data, no results, nothing persisted across runs;
    * the testdata dirs are immutable, and a changed dir means a new
    * (sfDir, name) key. Inference semantics are unchanged — the first
    * load of a key performs exactly the old footer read (mergeSchema
    * stays default-off either way, so multi-file frames still read the
    * single representative footer). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]()

  private def readWithCachedSchema(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent((sfDir, name),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two on-disk generations: INT64
      // TIMESTAMP(NANOS) (rejected by Spark's reader unless read as long)
      // and plain timestamp[us] (no tz -> TIMESTAMP_NTZ). Dispatch on the
      // footer type so both load, and normalize to TimestampType (session
      // tz is UTC everywhere, so NTZ -> LTZ preserves wall time) at µs
      // precision — the same precision DuckDB lands on, so oracles agree.
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = readWithCachedSchema(spark, sfDir, name)
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
    } else readWithCachedSchema(spark, sfDir, name)

  /** Load + spread for compute-heavy downstream work (tokenization,
    * shingling, hashing, pairwise similarity).
    *
    * A parquet scan parallelizes by file split, and a single row group is
    * one unsplittable partition — the testdata tables are exactly that, so
    * without this every per-row kernel runs on ONE core of the 32. At
    * cluster scale inputs arrive as many splits and the `numPartitions <
    * defaultParallelism` guard makes this a no-op — it only round-robins
    * rows when the scan genuinely under-parallelizes the machine, which is
    * the same reason Spark itself coalesces/ splits via AQE on shuffles
    * (scans have no such runtime re-plan). */
  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = load(spark, sfDir, name)
    val target = spark.sparkContext.defaultParallelism
    // decide from the file stat, not df.rdd.getNumPartitions — the .rdd
    // probe forces a full physical planning pass PER CALL (~100 ms), paid
    // by every query builder. A single parquet file under the split size
    // is exactly the one-partition-scan case the spread exists for; a
    // directory of files parallelizes by split on its own.
    val file = new java.io.File(s"$sfDir/$name.parquet")
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    if (file.isFile && file.length() < maxPart && target > 1)
      df.repartition(target)
    else df
  }

  /** Registers all tables as temp views so `spark.sql` text matches the
    * DuckDB oracle SQL 1:1 where we express queries in SQL. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Materialize a table bucketed (+ sorted) by its join key. Both sides
    * of a repeated equi-join written this way join with NO exchange and
    * NO sort — the co-located join pattern that amortizes the one-time
    * bucketing shuffle across every downstream join at 100 TB
    * (PlanSpec proves the exchange-free plan). */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
