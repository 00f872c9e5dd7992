package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("binned band join: inclusive bounds, key isolation, no duplicates") {
    val sess = spark
    import sess.implicits._
    val left = Seq(
      (1L, 1000L, "p1"), // band [940, 1000]
      (1L, 940L, "p2"),
      (2L, 1000L, "p3")  // other key
    ).toDF("k", "t", "tag").withColumn("t", timestamp_seconds(col("t")))
    val right = Seq(
      (1L, 940L, "rA"),  // on p1's lower bound (inclusive), on p2's upper
      (1L, 1000L, "rB"), // on p1's upper bound
      (1L, 939L, "rC"),  // just outside p1's band
      (1L, 1001L, "rD"), // just after p1
      (2L, 999L, "rE")   // key 2 only
    ).toDF("k", "t", "rtag").withColumn("t", timestamp_seconds(col("t")))

    val got = RangeJoin.binned(left, right, key = "k", ts = "t",
      loSec = -60, hiSec = 0, rightPrefix = "v_")
      .select(col("tag"), col("v_rtag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val want = Seq(("p1", "rA"), ("p1", "rB"), ("p2", "rC"), ("p2", "rA"),
      ("p3", "rE"))
    assert(got.sorted == want.sorted)
    // exactly-once: no pair surfaces from both candidate bins
    assert(got.distinct.length == got.length)
  }

  test("parity with the naive theta join on real events; no nested loop") {
    val ev = graft.core.Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val naive = p.join(v,
        p("user_id") === v("user_id") &&
        col("vts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("vts") <= col("ts"))
      .select(col("event_id"), col("vts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val binnedDf = RangeJoin.binned(p,
      ev.filter(col("event_type") === "view").select(col("user_id"), col("ts")),
      key = "user_id", ts = "ts", loSec = -3600, hiSec = 0, rightPrefix = "v_")
    val binned = binnedDf.select(col("event_id"), col("v_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
    val physical = binnedDf.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"), physical)
  }
}
