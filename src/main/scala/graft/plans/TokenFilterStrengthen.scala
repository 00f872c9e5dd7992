package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.CountTokens

/** Optimizer rule: strengthen token-count lower-bound filters with a
  * derived character-length bound.
  *
  * Soundness: every token is a non-overlapping span of >= 1 character, so
  * `count_tokens(t) <= length(t)` always — hence
  * `count_tokens(t) > n  ==>  length(t) > n` and the conjunction is
  * equivalent to the original predicate.
  *
  * Why it pays: `length` on a UTF8String is O(bytes) pointer arithmetic
  * with no allocation, while `count_tokens` runs the full tokenizer scan.
  * The derived conjunct is placed FIRST, so codegen's short-circuit
  * evaluation rejects short rows before tokenizing them — on a corpus
  * where the filter is selective (e.g. "documents with > 4k tokens" over
  * mostly-short web text) the tokenizer runs only on plausible rows.
  * This is the measurement-justified custom-rule slot SURVEY.md §4
  * reserved (the engine needs no rules for parity).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule); the
  * rule reaches fixpoint in one extra pass because the derived conjunct
  * is detected by semanticEquals and never re-added.
  */
object TokenFilterStrengthen extends Rule[LogicalPlan] with PredicateHelper {

  private def derived(e: Expression): Option[Expression] = e match {
    case GreaterThan(CountTokens(t), l @ Literal(_, IntegerType)) =>
      Some(GreaterThan(Length(t), l))
    case GreaterThanOrEqual(CountTokens(t), l @ Literal(_, IntegerType)) =>
      Some(GreaterThanOrEqual(Length(t), l))
    case LessThan(l @ Literal(_, IntegerType), CountTokens(t)) =>
      Some(LessThan(l, Length(t)))
    case LessThanOrEqual(l @ Literal(_, IntegerType), CountTokens(t)) =>
      Some(LessThanOrEqual(l, Length(t)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val adds = conjuncts.flatMap(derived)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (adds.isEmpty) f
      else Filter((adds ++ conjuncts).reduce(And), child)
  }
}
