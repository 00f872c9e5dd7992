package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator (SURVEY.md §2.10 extension surface):
  * gap-based sessionization via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset custom-state path, for semantics
  * `session_window` can't express (per-session running aggregates,
  * session-local dedup, early emission policies).
  *
  * State per user = the open session (start, last ts, count, sum). A
  * micro-batch folds its rows into the state in event-time order and
  * emits every session closed by a gap within the batch; the event-time
  * timeout closes the final open session once the WATERMARK passes
  * last-ts + gap — exactly the `session_window` + watermark contract,
  * but with the policy in user code.
  *
  * Scale: state is O(users) (one open session each, ~40 bytes), sharded
  * by the groupByKey shuffle across the cluster; rows stream through,
  * only closed sessions are emitted.
  */
object StatefulSessions {

  case class Open(startSec: Long, lastSec: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: Long, n_events: Long,
      total_value: Double)

  /** @param gapSec session gap in seconds */
  def sessionize(events: Dataset[(Long, Long, Double)], gapSec: Long):
      Dataset[Session] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed last-ts + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator(Session(user, s.startSec, s.n, s.total))
          } else {
            var open = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, sec, v, _) =>
              open match {
                case null =>
                  open = Open(sec, sec, 1, v)
                // <= gap merges: session_window coalesces ADJACENT windows
                // (an event exactly gap after the last still extends the
                // session) — matched here so the parity spec holds.
                // min/max, not assignment: an out-of-order event older
                // than lastSec must not REWIND the session horizon
                // (timeout would fire early) or move session_start
                // forward. Under today's 0-second watermark the rewind
                // is unreachable (per-batch sort + late-row drop), so
                // this guards the operator's contract for any future
                // delayThreshold parameterization; disorder beyond the
                // gap would coalesce into the open session — the
                // single-Open state bound.
                case o if sec - o.lastSec <= gapSec =>
                  open = o.copy(startSec = math.min(o.startSec, sec),
                    lastSec = math.max(o.lastSec, sec),
                    n = o.n + 1, total = o.total + v)
                case o =>
                  closed += Session(user, o.startSec, o.n, o.total)
                  open = Open(sec, sec, 1, v)
              }
            }
            state.update(open)
            state.setTimeoutTimestamp((open.lastSec + gapSec) * 1000)
            closed.result().iterator
          }
      }
  }

  /** Drive [[sessionize]] over the bounded events table (single batch +
    * an empty finalizing batch is handled by processAllAvailable via the
    * timeout) — used by the parity spec against batch session_window. */
  def sessionizeBatchParity(spark: SparkSession, rows: Seq[(Long, Long, Double)],
      gapSec: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val out = sessionize(in.toDS(), gapSec)
    val name = s"graft_sessions_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far past every open session to flush state
      val maxSec = rows.map(_._2).max
      in.addData((Long.MaxValue, maxSec + 10 * gapSec, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("user_id") =!= Long.MaxValue)
  }
}
