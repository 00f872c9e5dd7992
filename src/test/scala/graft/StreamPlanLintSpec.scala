package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.streaming.operators.stateful.join.StreamingSymmetricHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec

import graft.streaming.StreamingOps

/** Streaming counterpart of [[CatalogPlanLintSpec]]: drains every
  * `stream_*` catalog entry at sf0.001 and asserts the no-scale-killer
  * invariants on the REAL micro-batch executed plans (recorded by the
  * drain paths into `StreamingOps.lastMicroBatchPlans` — the
  * memory-sink frame an entry returns is a LocalTableScan, lint-blind
  * by construction). Invariants 1-3 are the batch lint's, checked with
  * the SAME [[PlanLint]] proofs; plus the streaming-only killer:
  *
  *   4. no stream-stream join whose state cannot be evicted — a
  *      [[StreamingSymmetricHashJoinExec]] with NO state watermark
  *      predicate on either side buffers both streams forever (the
  *      unbounded-state cliff); every join must carry at least one.
  *
  * Every entry must record at least one plan, so a future drain path
  * that forgets to call `recordPlan` fails loudly instead of passing
  * vacuously. */
class StreamPlanLintSpec extends SparkSpec {

  // (entries, rule, why this occurrence is bounded — WITH the bound).
  // Same discipline as the batch lint: every entry must fire.
  private val whitelist: Seq[(Set[String], String, String)] = Seq.empty

  test("every streaming catalog entry: micro-batch plans free of scale killers; stream-stream joins watermark-evictable") {
    import scala.jdk.CollectionConverters._
    val names = SparkEntry.queries.keys.filter(_.startsWith("stream_"))
      .toSeq.sorted
    assert(names.nonEmpty, "no streaming entries found — wrong filter?")
    val violations = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val fired = scala.collection.mutable.Set.empty[Int]
    var linted = 0
    var joinsChecked = 0
    for (name <- names) {
      StreamingOps.lastMicroBatchPlans.clear()
      SparkEntry.queries(name)(spark, sf).count()
      val recorded = StreamingOps.lastMicroBatchPlans.asScala.toSeq
      assert(recorded.nonEmpty,
        s"$name drained without recording a micro-batch plan — a drain " +
          "path is missing its recordPlan call")
      for ((sink, plan) <- recorded) {
        linted += 1
        val hits = plan.collectWithSubqueries {
          case e: ShuffleExchangeExec
              if e.outputPartitioning == SinglePartition =>
            Some("single-partition-exchange")
          case _: CartesianProductExec => Some("cartesian")
          case j: BroadcastNestedLoopJoinExec =>
            val bcast = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
              case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
            }
            PlanLint.boundedRows(bcast) match {
              case Some(bound) if bound <= 256 => None
              case _ => Some("nested-loop-join-unbounded")
            }
          case w: WindowExec if w.partitionSpec.isEmpty =>
            if (PlanLint.hasAggBelow(w.child)) None
            else Some("unpartitioned-window-over-raw-rows")
          case j: StreamingSymmetricHashJoinExec =>
            joinsChecked += 1
            if (j.stateWatermarkPredicates.left.isEmpty &&
              j.stateWatermarkPredicates.right.isEmpty)
              Some("stream-stream-join-without-watermark")
            else None
        }.flatten
        for (rule <- hits) {
          val wl = whitelist.indexWhere { case (qs, r, _) =>
            qs.contains(name) && r == rule
          }
          if (wl >= 0) fired += wl
          else violations += ((s"$name [$sink]", rule))
        }
      }
    }
    assert(violations.isEmpty,
      s"streaming plan-lint violations (whitelist ONLY with a stated " +
        s"bound):\n  " + violations.map { case (n, r) => s"$n: $r" }
        .mkString("\n  "))
    assert(fired.size == whitelist.size,
      s"stale whitelist entries (never fired): " +
        whitelist.indices.filterNot(fired).map(whitelist(_)).mkString("; "))
    info(s"${names.size} streaming entries drained, $linted micro-batch " +
      s"plans linted, $joinsChecked stream-stream joins watermark-checked")
    assert(joinsChecked >= 1,
      "expected at least one stream-stream join in the catalog " +
        "(stream_join_attrib) — did its plan stop recording?")
  }
}
