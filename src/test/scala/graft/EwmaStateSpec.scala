package graft

import org.apache.spark.sql.functions._

import graft.streaming.EwmaState

class EwmaStateSpec extends SparkSpec {
  private val sess = SparkSpec.spark
  import sess.implicits._

  private def replay(vals: Seq[Double]): (Double, Double, Long, Long) = {
    var (ewma, ewmad, i, anom) = (0.0, 0.0, 0L, 0L)
    vals.foreach { x =>
      if (i == 0L) { ewma = x; ewmad = 0.0 }
      else {
        val dev = math.abs(x - ewma)
        if (i >= 5L && dev > 3.0 * ewmad) anom += 1
        ewma = 0.2 * x + 0.8 * ewma
        ewmad = 0.2 * dev + 0.8 * ewmad
      }
      i += 1
    }
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r6(ewma), r6(ewmad), i, anom)
  }

  test("ewma state carries across micro-batches (event-time-ordered chunks)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (user_id, tsMicros, event_id, value): user 1 gets a spike late
    // enough to trip the warmup-gated anomaly check; user 2 stays flat
    val chunk1 = Seq(
      (1L, 1L, 1L, 10.0), (1L, 2L, 2L, 12.0), (1L, 3L, 3L, 11.0),
      (1L, 4L, 4L, 10.5), (2L, 1L, 5L, 5.0), (2L, 2L, 6L, 5.0))
    val chunk2 = Seq(
      (1L, 5L, 7L, 11.5), (1L, 6L, 8L, 500.0), (1L, 7L, 9L, 10.0),
      (2L, 3L, 10L, 5.0))
    val in = MemoryStream[(Long, Long, Long, Double)]
    val name = s"graft_ewma_parity_${System.nanoTime()}"
    val q = EwmaState.ewma(in.toDS()).toDF().writeStream
      .outputMode("update").format("memory").queryName(name).start()
    try {
      in.addData(chunk1: _*); q.processAllAvailable()
      in.addData(chunk2: _*); q.processAllAvailable()
    } finally q.stop()
    // update mode appends one state row per touched user per batch —
    // the LAST row per user is the final state
    val got = spark.table(name)
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"ewma", $"ewmad", $"n_anomalies")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val all = (chunk1 ++ chunk2).groupBy(_._1)
      .map { case (u, rows) =>
        u -> replay(rows.sortBy(r => (r._2, r._3)).map(_._4))
      }
    assert(got.keySet == all.keySet)
    all.foreach { case (u, (ewma, ewmad, n, anom)) =>
      val s = got(u)
      assert(s.getLong(0) == n, s"user $u n_events")
      assert(s.getDouble(1) == ewma, s"user $u ewma")
      assert(s.getDouble(2) == ewmad, s"user $u ewmad")
      assert(s.getLong(3) == anom, s"user $u anomalies")
    }
    // the spike at event 6 (after 5 warmup events) must register
    assert(all(1L)._4 >= 1L, "planted spike should count as an anomaly")
  }
}
