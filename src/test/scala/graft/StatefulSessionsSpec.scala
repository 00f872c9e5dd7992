package graft

import org.apache.spark.sql.functions._

import graft.streaming.StatefulSessions

class StatefulSessionsSpec extends SparkSpec {

  private val gap = 30L

  // (user, sec, value): user 1 has two sessions (gap 100 > 30 between
  // 1040 and 1140); user 2 one session; user 3 hits the exactly-gap
  // boundary (1030 - 1000 = 30 = gap -> MERGES, session_window adjacency
  // semantics). Times start at 1000, not 0: a row AT the initial
  // watermark (event time <= 0) would be dropped by the stateful
  // operator's late filter.
  private val rows = Seq(
    (1L, 1010L, 1.0), (1L, 1025L, 2.0), (1L, 1040L, 3.0),
    (1L, 1140L, 4.0), (1L, 1150L, 5.0),
    (2L, 1010L, 10.0), (2L, 1039L, 20.0),
    (3L, 1000L, 7.0), (3L, 1030L, 8.0))

  test("flatMapGroupsWithState sessionizer closes sessions by gap and timeout") {
    val got = StatefulSessions.sessionizeBatchParity(spark, rows, gap)
      .select("user_id", "session_start", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expect = Set(
      (1L, 1010L, 3L, 6.0), (1L, 1140L, 2L, 9.0),
      (2L, 1010L, 2L, 30.0),
      (3L, 1000L, 2L, 15.0))
    assert(got == expect, s"got $got")
  }

  test("custom sessionizer agrees with batch session_window") {
    val sess = spark
    import sess.implicits._
    val batch = rows.toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .groupBy(session_window(col("ts"), s"$gap seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("n_events"), col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val streaming = StatefulSessions.sessionizeBatchParity(spark, rows, gap)
      .select("user_id", "session_start", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streaming == batch,
      s"streaming $streaming\nvs batch $batch")
  }

  test("streaming rate limit: quota respected, earliest events admitted") {
    import org.apache.spark.sql.functions._
    val got = graft.streaming.StreamingOps
      .rateLimitedEvents(spark, sf, windowSec = 3600, maxPerWindow = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.nonEmpty)
    // naive: per (user, hour window) the first 5 events by (ts, event_id)
    val ev = graft.core.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(e => (e._1, e._2 / 1000000 / 3600 * 3600)).toSeq
      .flatMap { case ((u, w), g) =>
        g.sortBy(e => (e._2, e._3)).take(5).zipWithIndex
          .map { case (e, i) => (u, w, e._3, i + 1) }
      }.toSet
    assert(got.toSet == want,
      s"mismatch: ${(got.toSet -- want).take(3)} vs ${(want -- got.toSet).take(3)}")
  }
}
