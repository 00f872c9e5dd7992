package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** ntileBy must equal SQL ntile for every (n, k) shape — including the
  * boundary cases the arithmetic can get wrong: n not divisible by k,
  * n < k, and fully tied scores. */
class QuantilesSpec extends SparkSpec {

  private def check(rows: Seq[(Long, Double)], k: Int): Unit = {
    val df = spark.createDataFrame(rows).toDF("id", "s")
    val total = df.agg(count(lit(1)).as("n"))
    val got = Quantiles.ntileBy(df, col("s"), col("id"), k, total)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val expected = df
      .withColumn("bucket", ntile(k).over(Window.orderBy(col("s"), col("id"))))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(got == expected, s"k=$k rows=$rows")
  }

  test("matches SQL ntile: uneven division") {
    check((1L to 7L).map(i => (i, (i % 3).toDouble)), k = 3)
  }

  test("matches SQL ntile: n < k gives one row per bucket") {
    check(Seq((10L, 2.0), (20L, 1.0), (30L, 3.0)), k = 5)
  }

  test("matches SQL ntile: fully tied scores fall back to the tiebreak") {
    check((1L to 6L).map(i => (i, 1.0)), k = 4)
  }

  test("matches SQL ntile: exact division") {
    check((1L to 8L).map(i => (i, (9 - i).toDouble)), k = 4)
  }

  test("high-cardinality scores: still correct, but the distribution " +
      "degenerates to one cell per row (the documented scale contract)") {
    // unrounded distinct doubles — the shape callers must NOT feed at
    // scale: correctness holds, but the distribution the unpartitioned
    // window sorts is as large as the input (n cells, single task)
    val rows = (1L to 200L).map(i => (i, i * 0.0314159 + 1.0 / i))
    check(rows, k = 7)
    val df = spark.createDataFrame(rows).toDF("id", "s")
    val cells = df.select(col("s")).distinct().count()
    assert(cells == rows.size.toLong,
      "expected fully distinct scores to degenerate to one cell per row")
    // the rounded form callers use keeps the distribution bounded
    val rounded = df.select(round(col("s"), 4).as("s")).distinct().count()
    assert(rounded <= rows.size.toLong)
  }

  test("cell contract ENFORCED: a distribution wider than maxCells fails " +
      "loudly instead of silently running the single-task sort") {
    val rows = (1L to 200L).map(i => (i, i * 0.0314159 + 1.0 / i))
    val df = spark.createDataFrame(rows).toDF("id", "s")
    val total = df.agg(count(lit(1)).as("n"))
    val e = intercept[Exception] {
      Quantiles.ntileBy(df, col("s"), col("id"), 4, total,
        maxCells = 100).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxCells"),
      s"expected the cell-contract error, got: ${e.getMessage}")
    // the same data discretized passes under the same budget
    val ok = Quantiles.ntileBy(df, round(col("s"), 0), col("id"), 4, total,
      maxCells = 100)
    assert(ok.count() == 200)
    // grouped variant: per-GROUP budget
    val g = spark.createDataFrame(rows.map { case (i, s) =>
      (if (i % 2 == 0) "a" else "b", i, s) }).toDF("g", "id", "s")
    val totals = g.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val e2 = intercept[Exception] {
      Quantiles.ntileWithin(g, col("g"), col("s"), col("id"), 4, totals,
        maxCells = 50).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("maxCells"))
    assert(Quantiles.ntileWithin(g, col("g"), round(col("s"), 0), col("id"),
      4, totals, maxCells = 50).count() == 200)
  }

  test("ntileWithin matches SQL ntile PARTITION BY group, incl. uneven groups") {
    val rows = Seq(
      ("a", 1L, 2.0), ("a", 2L, 1.0), ("a", 3L, 1.0), ("a", 4L, 3.0),
      ("a", 5L, 0.5), ("b", 6L, 9.0), ("b", 7L, 8.0),
      ("c", 8L, 4.0), ("c", 9L, 4.0), ("c", 10L, 4.0), ("c", 11L, 4.0))
    val df = spark.createDataFrame(rows).toDF("g", "id", "s")
    val totals = df.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val got = Quantiles.ntileWithin(df, col("g"), col("s"), col("id"),
        k = 3, totals)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    val expected = df
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy(col("g")).orderBy(col("s"), col("id"))))
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(got == expected)
  }
}
