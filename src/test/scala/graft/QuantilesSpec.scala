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
}
