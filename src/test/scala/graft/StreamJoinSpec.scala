package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval-join contract (the unbounded-input semantics
  * behind `stream_join_attrib`, whose driver gate runs on a bounded
  * file stream): only clicks inside the per-view attribution window
  * join, matches arrive incrementally across micro-batches, and rows
  * behind both watermarks never produce output. */
class StreamJoinSpec extends SparkSpec {

  test("interval join emits in-window pairs across batches, drops the rest") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sess.sqlContext

    val views = MemoryStream[(Long, Long, Long)] // (view_id, user, sec)
    val clicks = MemoryStream[(Long, Long, Long)]
    val v = views.toDF().toDF("view_id", "v_user", "vsec")
      .withColumn("vts", timestamp_seconds(col("vsec")))
      .withWatermark("vts", "10 seconds")
    val c = clicks.toDF().toDF("click_id", "c_user", "csec")
      .withColumn("cts", timestamp_seconds(col("csec")))
      .withWatermark("cts", "10 seconds")
    val joined = v.join(c,
        expr("v_user = c_user AND cts > vts AND cts <= vts + interval 60 seconds"))
      .select(col("view_id"), col("click_id"))
    val name = "graft_stream_join_spec"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    def got() = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // view for user 1 at t=100; click at t=130 (in window) joins even
      // though it arrives in a LATER batch (buffered stream state)
      views.addData((1L, 1L, 100L))
      q.processAllAvailable()
      assert(got().isEmpty)
      clicks.addData((10L, 1L, 130L))
      q.processAllAvailable()
      assert(got() == Set((1L, 10L)), got().toString)

      // out-of-window click (t=200 > 100+60) and wrong-user click: no rows
      clicks.addData((11L, 1L, 200L), (12L, 2L, 120L))
      q.processAllAvailable()
      assert(got() == Set((1L, 10L)), got().toString)

      // second view inside the SAME user's history: a click joins EVERY
      // qualifying view (interval join, not first-touch) — including the
      // PREVIOUSLY-buffered click at t=200, which is in-window for this
      // view (190 < 200 <= 250) even though it missed view 1's window
      views.addData((2L, 1L, 190L))
      clicks.addData((13L, 1L, 195L))
      q.processAllAvailable()
      assert(got() == Set((1L, 10L), (2L, 11L), (2L, 13L)), got().toString)
    } finally q.stop()
  }
}
