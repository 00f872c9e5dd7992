package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of join: nearest prior, inclusive ties, left-outer") {
    val sess = spark
    import sess.implicits._
    val left = Seq(
      (1L, 100L, "p1"), // after r at 90 and 100 -> tie is inclusive (100)
      (1L, 95L, "p2"),  // -> r at 90
      (1L, 10L, "p3"),  // no prior right -> nulls
      (2L, 50L, "p4")   // key with no right rows at all -> nulls
    ).toDF("k", "t", "tag")
      .withColumn("t", timestamp_seconds(col("t")))
    val right = Seq(
      (1L, 90L, 7L, "r90"),
      (1L, 100L, 8L, "r100a"),
      (1L, 100L, 9L, "r100b"), // equal ts: larger tiebreak wins
      (1L, 200L, 10L, "r200")  // in the future of every left row
    ).toDF("k", "t", "rid", "rtag")
      .withColumn("t", timestamp_seconds(col("t")))

    val out = AsOfJoin.backward(left, right, key = "k", ts = "t",
      tiebreak = "rid", rightPrefix = "m_")
      .select(col("tag"), col("m_rtag"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    assert(out("p1") == "r100b") // ts<=, tie broken to the larger rid
    assert(out("p2") == "r90")
    assert(out("p3") == null)
    assert(out("p4") == null)
  }

  test("fractional tiebreaks keep their order (no long truncation)") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 100L)).toDF("k", "ts")
    // both right rows tie on ts; 2.9 vs 2.7 both truncated to 2 under
    // the old cast("long"), making the pick partition-order-dependent
    val right = Seq((1L, 100L, 2.7, "lo"), (1L, 100L, 2.9, "hi"))
      .toDF("k", "ts", "tb", "tag")
    val out = AsOfJoin.backward(left, right, "k", "ts", "tb")
      .select("r_tag").collect()(0).getString(0)
    assert(out == "hi", s"largest fractional tiebreak must win, got $out")
  }

  test("backward as-of join: every left row appears exactly once") {
    val ev = core.Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("vid"))
    val out = AsOfJoin.backward(p, v, "user_id", "ts", "vid")
    assert(out.count() == p.count())
    assert(out.select("event_id").distinct().count() == p.count())
    // attached view is never in the future
    assert(out.filter(col("r_ts") > col("ts")).count() == 0)
  }
}
