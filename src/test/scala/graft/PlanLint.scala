package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}

/** Shared plan-shape proofs for the two lint specs (batch catalog:
  * [[CatalogPlanLintSpec]]; streaming micro-batch: [[StreamPlanLintSpec]])
  * — ONE definition of "provably bounded" so the specs cannot drift. */
object PlanLint {

  /** Max rows a broadcast-side subtree can produce, when that is
    * statically provable: an aggregate with no grouping keys — or only
    * FOLDABLE ones (`groupBy(lit(0))`) — is at most 1 row; a limit is
    * its literal; a local relation or Range is its literal size; other
    * unary nodes can only keep or shrink row count (project/filter/
    * sort/exchange/agg) — EXCEPT the row-expanding ones
    * (Generate/Expand), which void any child bound. */
  def boundedRows(p: SparkPlan): Option[Long] = {
    // Alias never reports foldable — strip it so groupBy(lit(0))'s
    // partial-agg keys (`0 AS 0#n`) prove the ≤1-group bound
    def stripAlias(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression =
      e match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => stripAlias(a.child)
        case other => other
      }
    def aggBound(grouping: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Option[Long] =
      if (grouping.forall(stripAlias(_).foldable)) Some(1L) else None
    p match {
      case a: HashAggregateExec => aggBound(a.groupingExpressions)
        .orElse(a.children.headOption.flatMap(boundedRows))
      case a: SortAggregateExec => aggBound(a.groupingExpressions)
        .orElse(a.children.headOption.flatMap(boundedRows))
      case a: ObjectHashAggregateExec => aggBound(a.groupingExpressions)
        .orElse(a.children.headOption.flatMap(boundedRows))
      case l: org.apache.spark.sql.execution.GlobalLimitExec =>
        Some(l.limit.toLong)
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
        Some(t.limit.toLong)
      case r: org.apache.spark.sql.execution.RangeExec => Some(r.numElements.toLong)
      case l: org.apache.spark.sql.execution.LocalTableScanExec => Some(l.rows.size.toLong)
      // row-EXPANDING unary nodes: explode/posexplode and rollup/cube
      // multiply rows, so a child bound does NOT bound them — 'explode
      // over a global aggregate' must resolve to None, not Some(1),
      // or an unbounded BNLJ could hide behind a 1-row-agg subtree
      case _: org.apache.spark.sql.execution.GenerateExec => None
      case _: org.apache.spark.sql.execution.ExpandExec => None
      case other if other.children.size == 1 => boundedRows(other.children.head)
      case _ => None
    }
  }

  def hasAggBelow(p: SparkPlan): Boolean =
    p.exists {
      case _: HashAggregateExec | _: SortAggregateExec |
           _: ObjectHashAggregateExec => true
      case _ => false
    }
}
