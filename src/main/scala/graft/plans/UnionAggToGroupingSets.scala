package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: collapse a UNION ALL of per-dimension aggregations
  * over the same input into ONE grouping-sets pass — the SURVEY.md §4
  * candidate for the A2/A3/A4 accuracy family, which is naturally
  * written as
  *
  *   SELECT lang, NULL,  agg... GROUP BY lang
  *   UNION ALL SELECT NULL, type, agg... GROUP BY type
  *   UNION ALL SELECT NULL, NULL, agg...
  *
  * and naively executes as one SCAN + SHUFFLE PER BRANCH. The rewrite
  * emits the already-resolved grouping-sets shape Catalyst itself
  * builds for GROUP BY GROUPING SETS — Expand (one projection per
  * branch: the base columns, each dimension either its expression or
  * the branch's NULL padding, plus a literal set id) under a single
  * Aggregate grouped by (dims..., set id) — so the family costs one
  * scan and one partial-aggregated shuffle at any input size. The set
  * id keeps duplicate grouping sets and data-NULL dimension values
  * separate exactly as the union did; it is grouped on but not
  * projected, so the rewritten output is attribute-for-attribute the
  * Union's own (exprIds preserved — parents never re-resolve).
  *
  * Fires only when every condition verifiably holds (else leaves the
  * plan alone): each branch is Aggregate over (optionally a
  * deterministic Project over) pairwise-sameResult bases; every output
  * position is either a measure — aggregate expressions semantically
  * equal across branches after remapping onto the first base — or a
  * dimension — a branch grouping expression where present, a foldable
  * NULL where padded; every branch grouping expression is projected
  * (no hidden grouping keys, which the union WOULD surface as
  * duplicate rows); all expressions deterministic; and the Union
  * already reports every dimension nullable (the rewrite never
  * narrows or widens output nullability). PlanAuditSpec pins the
  * single-scan shape on `rel_accuracy_sets`; that query's DuckDB
  * oracle (the literal UNION ALL) is the cross-engine semantics
  * proof.
  */
object UnionAggToGroupingSets extends Rule[LogicalPlan] {

  private case class Branch(
      groups: Seq[Expression],
      results: Seq[NamedExpression],
      base: LogicalPlan)

  private def trimAlias(e: Expression): Expression = e match {
    case Alias(c, _) => trimAlias(c)
    case other => other
  }

  private def isNullLit(e: Expression): Boolean = trimAlias(e) match {
    case Literal(null, _) => true
    case c: Cast => isNullLit(c.child)
    case _ => false
  }

  private def hasAgg(e: Expression): Boolean =
    e.exists(_.isInstanceOf[AggregateExpression])

  /** Attributes referenced OUTSIDE any AggregateExpression subtree. A
    * measure with such refs (e.g. concat(lang, count(*))) would, after
    * the rewrite, reference a base attribute that is not among the new
    * grouping expressions (dims + set id) — unbindable at physical
    * planning — so positions with any are rejected as measures. */
  private def attrsOutsideAgg(e: Expression): Seq[Attribute] = e match {
    case _: AggregateExpression => Nil
    case a: Attribute => Seq(a)
    case other => other.children.flatMap(attrsOutsideAgg)
  }

  /** Inline the branch's Project (when present) into its aggregate so
    * every branch is expressed directly over its base plan. Top-level
    * attribute results keep their exprId through a re-alias. */
  private def toBranch(p: LogicalPlan): Option[Branch] = p match {
    case Aggregate(g, res, Project(list, base), _)
        if list.forall(_.deterministic) =>
      val m = AttributeMap(list.map(ne => ne.toAttribute -> trimAlias(ne)))
      def sub(e: Expression): Expression =
        e.transformUp { case a: Attribute => m.getOrElse(a, a) }
      def subNamed(ne: NamedExpression): NamedExpression = ne match {
        case a: Attribute if m.contains(a) =>
          Alias(m(a), a.name)(exprId = a.exprId)
        case a: Attribute => a
        case al: Alias =>
          al.withNewChildren(Seq(sub(al.child))).asInstanceOf[NamedExpression]
        case _ => null // unexpected named-expression shape: bail below
      }
      val named = res.map(subNamed)
      if (named.contains(null)) None
      else Some(Branch(g.map(sub), named, base))
    case Aggregate(g, res, base, _) => Some(Branch(g, res, base))
    case _ => None
  }

  /** Positional remap of expressions from `b`'s base attributes onto the
    * first branch's base attributes (bases are sameResult; outputs align
    * positionally after canonicalization). */
  private def remap(e: Expression, from: LogicalPlan,
      to: LogicalPlan): Expression = {
    val m = AttributeMap(from.output.zip(to.output))
    e.transformUp { case a: Attribute => m.getOrElse(a, a) }
  }

  private def rewrite(u: Union): Option[LogicalPlan] = {
    val branches = u.children.map(toBranch)
    if (branches.exists(_.isEmpty)) return None
    val bs = branches.flatten
    val base = bs.head.base
    if (!bs.tail.forall(b => b.base.output.length == base.output.length &&
        b.base.sameResult(base))) return None
    if (bs.exists(b => !b.groups.forall(_.deterministic) ||
        !b.results.forall(_.deterministic))) return None
    val nOut = bs.head.results.length
    if (bs.exists(_.results.length != nOut)) return None

    // classify each output position across branches
    val isMeasure = (0 until nOut).map(i => bs.forall(b =>
      hasAgg(b.results(i)) &&
        attrsOutsideAgg(trimAlias(b.results(i))).isEmpty))
    val isDim = (0 until nOut).map(i => bs.forall(b =>
      !hasAgg(b.results(i)) &&
        (isNullLit(b.results(i)) ||
          b.groups.exists(_.semanticEquals(trimAlias(b.results(i)))))))
    if ((0 until nOut).exists(i => !isMeasure(i) && !isDim(i))) return None

    // measures: semantically equal across branches after base remap
    val ok = (0 until nOut).filter(isMeasure).forall { i =>
      val first = trimAlias(bs.head.results(i))
      bs.tail.forall(b =>
        remap(trimAlias(b.results(i)), b.base, base).semanticEquals(first))
    }
    if (!ok) return None

    val dimPos = (0 until nOut).filter(isDim)
    // the union must already report every dimension nullable (NULL
    // padding does that whenever a dim is absent somewhere); never
    // change output nullability
    if (dimPos.exists(i => !u.output(i).nullable)) return None

    // canonical dim expression (over the first base) per dim position,
    // consistent across every branch where present
    val dimExpr = new Array[Expression](nOut)
    for (i <- dimPos; b <- bs if !isNullLit(b.results(i))) {
      val e = remap(trimAlias(b.results(i)), b.base, base)
      if (dimExpr(i) == null) dimExpr(i) = e
      else if (!dimExpr(i).semanticEquals(e)) return None
    }
    // every branch grouping expression must be one of ITS projected dims
    // (a hidden grouping key would mean the union emitted duplicate rows
    // per visible dim combination — not expressible as a grouping set)
    val noHidden = bs.forall { b =>
      val visible = dimPos.filter(i => !isNullLit(b.results(i)))
        .map(i => remap(trimAlias(b.results(i)), b.base, base))
      b.groups.forall(g =>
        visible.exists(_.semanticEquals(remap(g, b.base, base))))
    }
    if (!noHidden) return None

    val dimAttrs = dimPos.map { i =>
      AttributeReference(u.output(i).name, u.output(i).dataType,
        nullable = true)()
    }
    val gid = AttributeReference("graft_gid", IntegerType, nullable = false)()
    val projections = bs.zipWithIndex.map { case (b, bi) =>
      base.output ++ dimPos.map { i =>
        if (isNullLit(b.results(i))) Literal(null, u.output(i).dataType)
        else dimExpr(i)
      } :+ Literal(bi)
    }
    val expand = Expand(projections, base.output ++ dimAttrs :+ gid, base)
    val dimAttrAt = dimPos.zip(dimAttrs).toMap
    val resultExprs = (0 until nOut).map { i =>
      if (isMeasure(i)) bs.head.results(i)
      else {
        val first = bs.head.results(i)
        Alias(dimAttrAt(i), first.name)(exprId = first.exprId)
      }
    }
    Some(Aggregate((dimAttrs :+ gid).toSeq, resultExprs, expand))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case u @ Union(children, false, false) if children.length >= 2 =>
      rewrite(u).getOrElse(u)
  }
}
