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

  test("fuzz: binned join equals reference enumeration on random data") {
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      // timestamps cluster around bin boundaries of every band below
      val mk = () => (1 + rnd.nextInt(3)).toLong ->
        (100000L + rnd.nextInt(400) * 15L + rnd.nextInt(3) - 1)
      val ls = Seq.fill(60)(mk()).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = Seq.fill(60)(mk()).zipWithIndex
        .map { case ((k, t), i) => (k, t, (1000 + i).toLong) }
      for ((lo, hi) <- Seq((-60L, 0L), (-45L, 45L), (30L, 90L))) {
        val want = (for {
          (lk, lt, lid) <- ls
          (rk, rt, rid) <- rs
          if lk == rk && rt >= lt + lo && rt <= lt + hi
        } yield (lid, rid)).sorted
        val left = ls.toDF("k", "t", "lid")
          .withColumn("t", timestamp_seconds(col("t")))
        val right = rs.toDF("k", "t", "rid")
          .withColumn("t", timestamp_seconds(col("t")))
        val got = RangeJoin.binned(left, right, "k", "t", lo, hi, "r_")
          .select(col("lid"), col("r_rid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got == want, s"trial $trial band [$lo,$hi]")
      }
    }
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
