package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** 2D skyline (Pareto frontier, maximize both dimensions) — the classic
  * multi-criteria OLAP operator: a row survives iff no other row is >=
  * in both dimensions and > in at least one.
  *
  * Scale shape — the textbook `NOT EXISTS` self-join is O(n^2) and the
  * window formulation (`max(y) OVER (ORDER BY x DESC)`) forces an
  * `Exchange SinglePartition`. Instead:
  *
  *  1. reduce to the x -> max(y) table (keyed aggregate; one row per
  *     distinct x);
  *  2. range-partition that table by x DESC and persist (pinning the
  *     partitioning, the kmeans cache rule);
  *  3. per-partition maxima (numShufflePartitions rows — the bounded
  *     driver structure) give each partition an EXCLUSIVE broadcast
  *     prefix; a PARTITIONED window then computes the strict
  *     suffix-max within each partition — no task ever sees more than
  *     its range, which is exactly the [[GlobalOrder]] argument applied
  *     to a running aggregate;
  *  4. rows join back on x: dominated iff the strictly-higher-x suffix
  *     max reaches their y, or an equal-x row has strictly larger y.
  *
  * All comparisons are on exact column values (no float arithmetic), so
  * the frontier is engine-exact. Rows with a null in either dimension
  * are incomparable and never appear on the frontier (SQL null
  * comparison semantics drop them in the dominance filter; the prefix
  * fold skips null partition maxima the same way the window max
  * does). */
object Skyline {

  /** Pareto-max frontier of `df` over (`xCol`, `yCol`); returns the
    * surviving rows (all input columns). */
  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.groupBy(col(xCol)).agg(max(col(yCol)).as("maxy"))
      .repartitionByRange(col(xCol).desc)
      .sortWithinPartitions(col(xCol).desc)
      .withColumn("pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranged.count() // pin partition ids before the two downstream reads
    // per-partition maxima -> exclusive prefix max per partition
    // (numShufflePartitions values through the driver, never data rows)
    val parts = ranged.groupBy(col("pid")).agg(max(col("maxy")).as("pm"))
      .collect().map(r => r.getInt(0) -> r.get(1)).sortBy(_._1)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("pfx",
        ranged.schema("maxy").dataType, nullable = true)))
    val prefixRows = {
      var run: Any = null
      parts.map { case (pid, pm) =>
        val row = Row(pid, run)
        // track the prefix max with the column's natural ordering; a
        // null pm (partition whose y values are all null) contributes
        // nothing — matching the window max's null-skipping semantics.
        // Rows with null y can never dominate and are themselves
        // dropped by the final dominance filter (null comparisons).
        run = (run, pm) match {
          case (r, null) => r
          case (null, v) => v
          case (a: Comparable[Any] @unchecked, v) =>
            if (a.compareTo(v) >= 0) a else v
        }
        row
      }
    }
    val prefixDf = spark.createDataFrame(
      spark.sparkContext.parallelize(prefixRows.toSeq, 1), schema)
    val strictPrev = Window.partitionBy(col("pid"))
      .orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val gtTable = ranged.join(broadcast(prefixDf), "pid")
      .withColumn("lmax", max(col("maxy")).over(strictPrev))
      // greatest() skips nulls: gt is null only when x is the global max
      .withColumn("gt", greatest(col("lmax"), col("pfx")))
      .select(col(xCol), col("maxy"), col("gt"))
    df.join(gtTable, xCol)
      .filter(!((col("gt").isNotNull && col("gt") >= col(yCol))
        || col("maxy") > col(yCol)))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
