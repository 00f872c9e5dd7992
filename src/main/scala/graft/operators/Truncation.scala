package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

import graft.functions.{TextFunctions, TruncateTokens}

/** T5: the pluggable truncation-strategy registry
  * (truncation_utils.py:17-227 — TruncationStrategy ABC, the
  * start/end/smart built-ins, TruncationManager's `_strategies` map with
  * `register_strategy` type validation and `get_available_strategies`).
  *
  * Spark-first: a strategy is a COLUMN transformer — (text, budget) ->
  * the [[TruncateTokens]] stats struct — so custom strategies stay inside
  * the plan (codegen-able expressions, no driver loop), and everything
  * downstream (Engine.truncationAnswers, stats queries) is
  * strategy-agnostic.
  */
trait TruncationStrategy extends Serializable {
  def name: String
  /** Must return a struct with [[TruncateTokens.schema]]. */
  def truncate(text: Column, maxTokens: Column): Column
}

/** Built-in strategies delegate to the `truncate_tokens` expression
  * (start keeps a prefix, end a suffix, smart relabels start — exactly
  * the reference's placeholder, truncation_utils.py:123-156). */
private[operators] final case class BuiltinStrategy(name: String)
    extends TruncationStrategy {
  def truncate(text: Column, maxTokens: Column): Column =
    TextFunctions.truncate_tokens(text, maxTokens, lit(name))
}

object TruncationStrategies {

  private val builtins: Map[String, TruncationStrategy] =
    Seq("start", "end", "smart").map(n => n -> BuiltinStrategy(n)).toMap

  @volatile private var custom: Map[String, TruncationStrategy] = Map.empty

  def available: Seq[String] = (builtins.keySet ++ custom.keySet).toSeq.sorted

  /** Strategy lookup; unknown names fail fast with the available list
    * (the reference's validate_truncation_config error shape). */
  def get(name: String): TruncationStrategy =
    custom.getOrElse(name, builtins.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown truncation strategy '$name'; available: ${available.mkString(", ")}")))

  /** Register a custom strategy (truncation_utils.py:216-227). The
    * reference validates the class hierarchy; here the contract is the
    * output STRUCT TYPE, checked eagerly against [[TruncateTokens.schema]]
    * so a bad strategy fails at registration, not mid-job. */
  def register(strategy: TruncationStrategy): Unit = {
    val dt = org.apache.spark.sql.graftbridge.Bridge
      .expression(strategy.truncate(lit("probe"), lit(1))).dataType
    require(dt == TruncateTokens.schema,
      s"strategy '${strategy.name}' must return the truncation stats struct " +
        s"${TruncateTokens.schema.simpleString}, got ${dt.simpleString}")
    custom = custom + (strategy.name -> strategy)
  }
}
