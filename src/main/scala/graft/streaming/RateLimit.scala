package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Stateful streaming RATE LIMITER (per-tenant ingestion quota): admit at
  * most `maxPerWindow` events per (user, tumbling window), drop the rest
  * — the throttling gate an ingestion pipeline runs in front of expensive
  * downstream stages (the reference's rate limiting,
  * src/llm/async_llm_client.py:36 `RateLimitConfig`, re-expressed as an
  * event-time quota over the stream itself rather than wall-clock client
  * throttling).
  *
  * `flatMapGroupsWithState` keyed by (user, window): state = count
  * admitted so far (one Int per ACTIVE user-window, sharded by the group
  * shuffle); admitted rows emit immediately (append mode); the event-time
  * timeout clears the counter once the watermark passes the window end,
  * so state never outlives a window.
  *
  * Determinism contract: admission is by EVENT TIME (ts, event_id) among
  * the rows of one micro-batch (in-batch sort — the [[StatefulSessions]]
  * discipline). On a bounded drain (single batch) this is exactly the
  * batch `row_number() <= N` definition the DuckDB oracle replays; on an
  * unbounded stream, admission across batches is arrival-order within
  * the watermark — the standard quota semantics.
  */
object RateLimit {

  case class Admitted(user_id: Long, window_start: Long, event_id: Long,
      admit_rank: Int)

  /** @param events (user_id, event-time micros, event_id)
    * @param windowSec tumbling-window length in seconds
    * @param maxPerWindow admission quota per (user, window) */
  def rateLimit(events: Dataset[(Long, Long, Long)], windowSec: Long,
      maxPerWindow: Int): Dataset[Admitted] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("wstart",
        expr(s"((us div 1000000) div $windowSec) * $windowSec"))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("wstart"), col("us"), col("event_id"),
        col("ts"))
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Int, Admitted](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        case ((user, wstart), rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var n = state.getOption.getOrElse(0)
            val out = Seq.newBuilder[Admitted]
            rows.toSeq.sortBy(r => (r._3, r._4)).foreach {
              case (_, _, _, eid, _) =>
                if (n < maxPerWindow) {
                  n += 1
                  out += Admitted(user, wstart, eid, n)
                }
            }
            state.update(n)
            // clear at window end; Spark requires a timeout strictly
            // beyond the current watermark
            state.setTimeoutTimestamp(math.max((wstart + windowSec) * 1000L,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
