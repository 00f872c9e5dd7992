package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Custom stateful streaming operator: per-key EWMA / EWMAD anomaly
  * tracking via `mapGroupsWithState` — the carried-accumulator shape
  * that windowed aggregation can't express (each update depends on the
  * full decayed history, not a bounded window). The streaming
  * counterpart of [[graft.queries.Relational.ewmaAnomaly]]: same
  * constants, same update rule, same rounding, so the final per-user
  * states replay the batch DuckDB oracle exactly when micro-batches
  * arrive in event-time order (the verify harness drains the single
  * events file as one batch; a production deployment keys batches to an
  * ordered ingestion log or folds per event-time window).
  *
  * Scale: state is O(users) x 4 numbers, sharded by the groupByKey
  * shuffle; rows stream through once. Output mode is Update — one
  * current-state row per touched user per micro-batch.
  */
object EwmaState {

  case class St(ewma: Double, ewmad: Double, i: Long, anom: Long)
  case class UserEwma(user_id: Long, n_events: Long, ewma: Double,
      ewmad: Double, n_anomalies: Long)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** rows: (user_id, tsMicros, event_id, value); constants mirror the
    * batch query (alpha 0.2, 5-event warmup, 3-sigma-equivalent MAD
    * threshold). Within a batch rows fold in (ts, event_id) order. */
  def ewma(events: Dataset[(Long, Long, Long, Double)],
      alpha: Double = 0.2, warmup: Long = 5,
      k: Double = 3.0): Dataset[UserEwma] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[St, UserEwma](GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          var s = state.getOption.getOrElse(St(0.0, 0.0, 0L, 0L))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, x) =>
            s = if (s.i == 0L) St(x, 0.0, 1L, 0L)
            else {
              val dev = math.abs(x - s.ewma)
              val anom =
                s.anom + (if (s.i >= warmup && dev > k * s.ewmad) 1L else 0L)
              St(alpha * x + (1.0 - alpha) * s.ewma,
                alpha * dev + (1.0 - alpha) * s.ewmad, s.i + 1L, anom)
            }
          }
          state.update(s)
          UserEwma(user, s.i, r6(s.ewma), r6(s.ewmad), s.anom)
      }
  }
}
