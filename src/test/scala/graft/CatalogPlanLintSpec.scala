package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Catalog-wide plan lint: ONE spec that builds every registered
  * query's physical plan at sf0.001 and asserts the no-scale-killer
  * invariants the per-query PlanAudit/Plan specs pin individually —
  * so a FUTURE entry can't regress them silently:
  *
  *   1. no `Exchange SinglePartition` — the single-task funnel that
  *      caps an operator at one core regardless of cluster size
  *      (whitelist: empty, none expected);
  *   2. no `CartesianProduct` (whitelist: empty), and
  *      `BroadcastNestedLoopJoin` ONLY when the broadcast side is
  *      PROVABLY bounded: its subtree ends in a global aggregate
  *      (no grouping keys → exactly 1 row) or a literal local table /
  *      small Range (a value-cell or dimension grid). The bound is
  *      checked STRUCTURALLY, not by name, so a future entry crossing
  *      an unbounded frame fails even if its name is new;
  *   3. no `WindowExec` with an empty partition spec UNLESS its input
  *      is already an aggregated frame (an AggregateExec strictly
  *      below the window): every such site in the catalog windows over
  *      a bounded group domain — value cells, quantile buckets,
  *      judgment classes, calendar weeks — whose cardinality the
  *      per-query specs pin; an unpartitioned window directly over
  *      table rows (the real single-task sort cliff) still fails.
  *
  * The lint reads `queryExecution.sparkPlan` (the pre-AQE physical
  * plan, including subquery plans): what OUR code declares, before
  * runtime re-planning can mask a funnel at test scale. `stream_*`
  * entries are linted by the sibling [[StreamPlanLintSpec]], which
  * drains each one and asserts the same invariants on the REAL
  * micro-batch executed plans (the memory-sink frame an entry returns
  * is just a LocalTableScan — lint-blind by construction).
  * The residual name whitelist is exact and must stay small;
  * an UNUSED entry fails the lint too, so it can only shrink or be
  * consciously re-justified.
  */
class CatalogPlanLintSpec extends SparkSpec {

  // (queries, rule, why this occurrence is bounded — WITH the bound).
  // Every entry must fire or the lint fails; keep it ≤ 10 entries.
  private val whitelist: Seq[(Set[String], String, String)] = Seq(
    (Set("sim_topk_brute", "sim_topk_pq", "sim_ivf_recall", "sim_ivf_ndcg",
      "sim_knn_classify", "sim_matryoshka_recall", "sim_pq_recall",
      "sim_sq8_recall", "sim_hard_negatives"), "nested-loop-join-unbounded",
      "crosses the fixed ANN probe set: vec_id < PROBE_N (=10) pushed to " +
        "the parquet scan — ≤ 10 rows by the query's own literal"),
    (Set("rel_ab_test"), "nested-loop-join-unbounded",
      "crosses a 2-row arm LocalTableScan left-joined to per-arm unique " +
        "aggregates — ≤ 2 rows"),
    (Set("rel_gap_fill"), "nested-loop-join-unbounded",
      "crosses the calendar grid explode(sequence(min(day), max(day))) " +
        "over a global 1-row aggregate — ≤ ~2.4k days by the TPC-H " +
        "order-date span [1992-01-01, 1998-08-02] (the Generate above " +
        "the 1-row agg is row-expanding, so boundedRows correctly " +
        "refuses to prove it; the bound is the date-domain literal)"),
    (Set("rel_kendall_tau"), "nested-loop-join-unbounded",
      "crosses the y value-cell grid floor(l_extendedprice/100) — " +
        "≤ ~1.1k cells by the TPC-H price domain [900, 104950]"),
    (Set("rel_kmv_intersect"), "nested-loop-join-unbounded",
      "crosses the per-quarter KMV sketch table — ≤ 2 quarter rows, " +
        "each a k=64 bottom-k array"),
    (Set("ta_hybrid_related"), "nested-loop-join-unbounded",
      "crosses two 1-row probe lookups (vec_id = 0 / doc_id = 0 " +
        "equality filters on unique ids)"),
    (Set("ta_source_length_kl"), "nested-loop-join-unbounded",
      "crosses the length-histogram grid least(n_chars div 100, 49) — " +
        "≤ 50 buckets by the least() literal"),
    (Set("ta_source_term_js"), "nested-loop-join-unbounded",
      "crosses a union of two exploded GLOBAL top-k(200) vocab lists — " +
        "≤ 400 rows by the top_k_structs literal"),
    (Set("adv_salted_join"), "broadcast-over-raw-generate",
      "the salt grid explode(sequence(0, Salt−1)) sits ABOVE its " +
        "collapsing per-type aggregate (so the raw-generate walk cannot " +
        "see the collapse) — ≤ |event_type domain| × Salt(32) rows"),
    (Set("ta_source_term_js"), "broadcast-over-raw-generate",
      "explodes GLOBAL top-k(200) struct lists produced by 1-row " +
        "aggregates — ≤ 400 rows by the top_k_structs literal, with the " +
        "Generate above the collapsing agg"),
    (Set("sim_topk_ivf", "sim_topk_ivfpq", "sim_topk_rplsh",
      "sim_ivf_recall", "sim_ivf_ndcg"), "broadcast-over-raw-generate",
      "the broadcast build is the PROBE side (vec_id < 10 pushed to the " +
        "scan) exploded by an nprobe/tables LITERAL — ≤ 10 × literal " +
        "rows regardless of corpus size"),
    (Set("sim_neardups_rplsh"), "broadcast-over-raw-generate",
      "the sig-table self-join build: fan-out is the `tables` literal " +
        "(32) over an InMemoryRelation whose stats are ACTUAL rows, so " +
        "the estimate blindness is bounded at 32× — far under the " +
        "threshold→8GiB cliff window (~800×); candidate volume is " +
        "governed by the bits ≈ log₂(n) contract (SCALE_NOTES), and " +
        "the n-proportional vector re-attach is separately gated by a " +
        "MEASURED size against RpLshBroadcastCeiling (PlanAuditSpec " +
        "exercises both sides of that ceiling)"),
  )

  // "provably bounded" / "agg below" proofs shared with the streaming
  // lint — ONE definition in [[PlanLint]] so the two specs cannot drift
  private def boundedRows(p: SparkPlan): Option[Long] = PlanLint.boundedRows(p)
  private def hasAggBelow(p: SparkPlan): Boolean = PlanLint.hasAggBelow(p)

  test("every batch catalog entry: no single-partition exchange, no unbounded product, no unpartitioned window over raw rows") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
    val violations = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val fired = scala.collection.mutable.Set.empty[Int]
    var bnljBounded = 0
    var windowsOverAggs = 0
    for (name <- names) {
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
      val hits = plan.collectWithSubqueries {
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
          Some("single-partition-exchange")
        case _: CartesianProductExec => Some("cartesian")
        case j: BroadcastNestedLoopJoinExec =>
          val bcast = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          }
          boundedRows(bcast) match {
            // a 1-row or literal-grid broadcast side bounds the product
            // at |stream| × bound — a column-append, not a blow-up
            case Some(bound) if bound <= 256 => bnljBounded += 1; None
            case _ => Some("nested-loop-join-unbounded")
          }
        case w: WindowExec if w.partitionSpec.isEmpty =>
          if (hasAggBelow(w.child)) { windowsOverAggs += 1; None }
          else Some("unpartitioned-window-over-raw-rows")
        // rule 4 (r17, the rel_edit_pairs 100× post-mortem made
        // generic): a BROADCAST side with a RAW (un-aggregated)
        // Generate rides a static size estimate that never saw the
        // fan-out (SizeInBytes stats propagate the pre-explode scan
        // size — compressed parquet × fan-out compounds to a 100–1000×
        // under-estimate), so the planner broadcasts a frame that
        // grows ∝ n×fanout: the silent 8 GiB cliff that killed
        // rel_edit_pairs at 100×. A Generate COLLAPSED by an aggregate
        // before the broadcast is exempt: an aggregate's output never
        // exceeds its input, so the agg-blind estimate errs in the
        // OVER-estimate direction and the planner stops broadcasting
        // before the build outgrows anything. Raw-generate builds must
        // be whitelisted WITH the bound or pinned to a shuffled join.
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          val bcast = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          }
          def rawGenerate(p: SparkPlan): Boolean = p match {
            case _: HashAggregateExec | _: ObjectHashAggregateExec |
                 _: SortAggregateExec => false
            case _: org.apache.spark.sql.execution.GenerateExec => true
            case other => other.children.exists(rawGenerate)
          }
          if (!rawGenerate(bcast)) None
          else boundedRows(bcast) match {
            case Some(bound) if bound <= 256 => None
            case _ => Some("broadcast-over-raw-generate")
          }
      }
      hits.flatten.distinct.foreach { rule =>
        val wl = whitelist.indexWhere { case (qs, r, _) => qs(name) && r == rule }
        if (wl >= 0) fired += wl else violations += ((name, rule))
      }
    }
    info(s"${names.size} plans linted; $bnljBounded bounded-broadcast " +
      s"crossings, $windowsOverAggs unpartitioned windows over aggregated frames; " +
      s"${whitelist.size} whitelist entries, all fired: ${fired.size == whitelist.size}")
    assert(violations.isEmpty,
      s"plan-lint violations (whitelist ONLY with a stated bound):\n  " +
        violations.map { case (n, r) => s"$n: $r" }.mkString("\n  "))
    val unfired = whitelist.indices.filterNot(fired)
    assert(unfired.isEmpty, s"stale whitelist entries (never fired): " +
      unfired.map(whitelist(_)._1).mkString(", "))
  }
}
