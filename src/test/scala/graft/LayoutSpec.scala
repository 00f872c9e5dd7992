package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Storage-layout contracts for the write path: partitioned layouts
  * prune at the source (PartitionFilters, zero non-matching files
  * read), and dynamic partition overwrite replaces ONLY the partitions
  * a batch touches — the idempotent-backfill pattern every production
  * pipeline leans on. Complements the bucketed-join (exchange-free)
  * proof in ScaleSpec. */
class LayoutSpec extends SparkSpec {

  test("partitionBy layout prunes non-matching partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.partitionBy("lang").mode(SaveMode.Overwrite).parquet(dir)

    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected a lang partition filter at the scan:\n$scan")
    // the pruned scan must read only the en partition's rows
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en").count()
    assert(q.count() == expected)
  }

  test("z-order layout prunes on the NON-sorted dimension; 1-D sort cannot") {
    import graft.operators.ZOrder
    // deterministic 64x64 grid: the min-max pruning proxy is "how many
    // partitions hold rows matching a predicate on ONE dimension". A
    // layout sorted on x alone scatters y across every partition, so a
    // y-range predicate touches all of them; the Morton layout keeps
    // partitions inside rectangles, so the same predicate touches only
    // the stripe that intersects it.
    val n = 64
    val grid = spark.range((n * n).toLong)
      .select((col("id") % n).as("xb"), expr(s"id div $n").as("yb"))
    def touched(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .filter(col("yb") < 8)
        .select(col("pid")).distinct().count()
    val zTouched = touched(ZOrder.clusterByZ(grid, col("xb"), col("yb"), 16))
    val linTouched = touched(
      grid.repartitionByRange(16, col("xb")).sortWithinPartitions(col("xb")))
    assert(linTouched == 16L, s"1-D sort should scatter y: $linTouched")
    assert(zTouched * 2 <= linTouched,
      s"z-order touched $zTouched of $linTouched partitions — no pruning win")
    // and the Morton key itself is the standard interleave (the
    // property the layout relies on), checked through the engine
    val rows = spark.range(1).select(
      ZOrder.zorder2(lit(0L), lit(0L)).as("a"),
      ZOrder.zorder2(lit(1L), lit(0L)).as("b"),
      ZOrder.zorder2(lit(0L), lit(1L)).as("c"),
      ZOrder.zorder2(lit(3L), lit(5L)).as("d")).collect()(0)
    assert(rows.getLong(0) == 0L && rows.getLong(1) == 1L && rows.getLong(2) == 2L)
    assert(rows.getLong(3) == 39L) // interleave(11, 101) = 100111
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpo").toString
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "en"), (2L, "de"), (3L, "fr")).toDF("id", "lang")
        .write.partitionBy("lang").mode(SaveMode.Overwrite).parquet(dir)
      // second batch rewrites ONLY lang=en; de/fr untouched
      Seq((10L, "en")).toDF("id", "lang")
        .write.partitionBy("lang").mode(SaveMode.Overwrite).parquet(dir)
      val got = spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((10L, "en"), (2L, "de"), (3L, "fr")), got.toString)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("algebraic aggregates reaggregate: merge of partial aggs == full agg") {
    // the exact-agg sibling of ReaggregateSpec's sketch-merge: daily
    // partial (count, DECIMAL sum) rows roll up to the same totals as
    // one pass over raw events — materialize-fine, answer-coarse
    val ev = graft.core.Tables.load(spark, sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,2)").as("v"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val merged = daily.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).toSet
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).toSet
    assert(merged == direct, s"merged $merged\ndirect $direct")
  }

  test("hilbert index: bijective on sampled grid, consecutive d are adjacent") {
    import graft.operators.ZOrder
    val bits = 10
    // inverse round-trip on a deterministic sample of the grid
    val pts = for (x <- 0L until 1024L by 37; y <- 0L until 1024L by 41)
      yield (x, y)
    pts.foreach { case (x, y) =>
      val d = ZOrder.xy2d(bits, x, y)
      assert(d >= 0 && d < (1L << 20))
      assert(ZOrder.d2xy(bits, d) == ((x, y)), s"round-trip failed at ($x,$y)")
    }
    assert(pts.map { case (x, y) => ZOrder.xy2d(bits, x, y) }.distinct.size
      == pts.size)
    // the Hilbert property: consecutive indices are grid-adjacent —
    // this is what makes key RANGES connected regions (tighter min-max
    // pruning boxes than Morton's quadrant jumps)
    (0L until 5000L).foreach { d =>
      val (x1, y1) = ZOrder.d2xy(bits, d)
      val (x2, y2) = ZOrder.d2xy(bits, d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$d: (${x1},${y1}) -> (${x2},${y2}) not adjacent")
    }
    // codegen'd column path equals the kernel
    val s2 = spark
    import s2.implicits._
    val df = Seq((3L, 5L), (8L, 6L), (1023L, 1023L), (0L, 0L)).toDF("x", "y")
      .select(ZOrder.hilbert2(bits, org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"))).collect().map(_.getLong(0))
    assert(df.toSeq == Seq(ZOrder.xy2d(bits, 3, 5), ZOrder.xy2d(bits, 8, 6),
      ZOrder.xy2d(bits, 1023, 1023), ZOrder.xy2d(bits, 0, 0)))
  }
}
