package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{MapReduceConfig, MapReducePipeline, QaFormat, TextModel, ExtractiveModel}
import graft.sources.QaSources

/** Public library facade — the Spark-native equivalent of the reference's
  * `PipelineFactory.create_pipeline(...)` builder surface (README.md:48-75,
  * src/core/factory.py:27-162):
  *
  *   - `dataset` selects the loader (S1 financebench / S2 finqa);
  *   - `format` selects the formatter semantics (P4/P5/P6 thresholds,
  *     M4 XML vs M5 concat);
  *   - `truncation` selects the single-call plan shape (M9/T1-T5);
  *   - the model is pluggable ([[graft.pipeline.TextModel]], deterministic
  *     extractive default; an external-model impl plugs in via
  *     [[graft.pipeline.ExternalModel]] without changing the dataflow).
  *
  * A user of the reference maps their calls 1:1:
  * {{{
  * val qa     = Engine.loadDataset(spark, "financebench", path, limit = Some(10))
  * val engine = Engine(format = "json", chunkSize = 512, overlap = 64)
  * val out    = engine.answers(documentsDf)       // chunk->map->filter->reduce
  * val judged = engine.judged(documentsDf)        // + judge + batching
  * }}}
  */
case class Engine(
    format: String = "hybrid",
    chunkSize: Int = 64,
    overlap: Int = 16,
    threshold: Option[Int] = None,
    question: String = "spark query join data",
    model: TextModel = ExtractiveModel) {

  private val qaFormat: QaFormat = format match {
    case "json" => QaFormat.Json
    case "plain_text" | "plain" => QaFormat.Plain
    case "hybrid" => QaFormat.Hybrid
    case other => throw new IllegalArgumentException(
      s"unknown format '$other' (expected json | plain_text | hybrid)")
  }

  val config: MapReduceConfig = MapReduceConfig(
    chunkSize = chunkSize, overlap = overlap,
    threshold = threshold.getOrElse(qaFormat.defaultThreshold),
    question = question, format = qaFormat)

  private val pipeline = new MapReducePipeline(config, model)

  /** Map phase: scored chunks (M1/M2). */
  def mapped(documents: DataFrame): DataFrame = pipeline.mapped(documents)
  /** Full MapReduce: per-doc answers + filtering stats (M3-M7/P9/A7). */
  def answers(documents: DataFrame): DataFrame = pipeline.answers(documents)
  /** + judge & positional batching (O5/P7). */
  def judged(documents: DataFrame): DataFrame = pipeline.judged(documents)

  /** Truncation pipeline (M9/T1-T5 — the factory's
    * create_truncation_pipeline plan shape): no chunk explode, one
    * extractive call over the token-budgeted document, same answer/stats
    * contract. Budget = contextWindow - question tokens - buffer, floored
    * at 1000 (reference: truncation_formatter.py:45-73,
    * truncation_utils.py:247-266). */
  def truncationAnswers(documents: DataFrame,
      contextWindow: Int = 128000, buffer: Int = 2000,
      strategy: String = "start"): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val budget = math.max(1000,
      contextWindow - graft.functions.Tokenizer.countTokens(question) - buffer)
    val qtoks = array(
      graft.functions.Tokenizer.tokens(question).distinct.toIndexedSeq.map(lit): _*)
      .cast("array<string>") // empty question => array<null> otherwise
    documents
      // T5: resolved through the pluggable strategy registry, so custom
      // registered strategies reach the Engine by name
      .withColumn("t", graft.operators.TruncationStrategies.get(strategy)
        .truncate(col("text"), lit(budget)))
      .withColumn("ttoks", regex_tokens(col("t.text")))
      // same pluggable-model routing as MapReducePipeline.mapped: a custom
      // TextModel changes the truncation path too, not just answers()
      .withColumn("score",
        qaFormat.scaleUp(model.score(col("ttoks"), qtoks)))
      .select(col("doc_id"),
        col("t.original_tokens").as("original_tokens"),
        col("t.truncated_tokens").as("truncated_tokens"),
        col("t.retention_rate").as("retention_rate"),
        col("t.truncation_applied").as("truncation_applied"),
        col("score"),
        when(col("score") > config.threshold, model.content(col("ttoks")))
          .otherwise(lit("No answer found in document")).as("llm_answer"))
  }

  /** Truncation pipeline + judge stage — the reference evaluates BOTH
    * plan shapes with the same judge (async_evaluation applies to any
    * pipeline's answers); same 5-way judgment + positional batching
    * contract as MapReducePipeline.judged. */
  def truncationJudged(documents: DataFrame,
      contextWindow: Int = 128000, buffer: Int = 2000,
      strategy: String = "start"): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = truncationAnswers(documents, contextWindow, buffer, strategy)
    val scaled = qaFormat.scaleDown(col("score")) // back to 0-10
    // below-threshold scores are the truncation path's "no surviving
    // chunk"; routed through the model's judge slot like the MapReduce
    // path, so a custom model judges BOTH plan shapes
    val judgment = model.judge(scaled,
      when(col("score") <= config.threshold, lit(0)).otherwise(lit(1)))
    MapReducePipeline.positionalBatches(
      a.withColumn("judgment", judgment), col("doc_id"))
  }
}

object Engine {
  /** Canonical format names, one per arm of the [[Engine]] format
    * dispatch ('plain' is accepted as an alias but the reference
    * endpoint advertises 'plain_text' — main.py capabilities listing).
    * [[graft.QaService.models]] derives its listing from these so the
    * advertised surface cannot drift from what the dispatch accepts. */
  val supportedFormats: Seq[String] = Seq("json", "plain_text", "hybrid")
  /** Pipelines the engine exposes: `answers`/`judged` (mapreduce) and
    * `truncationAnswers` (truncation). */
  val supportedPipelines: Seq[String] = Seq("mapreduce", "truncation")

  /** Dataset registry (factory.py:203-220 register_dataset analog). */
  def loadDataset(spark: SparkSession, dataset: String, path: String,
      limit: Option[Int] = None): DataFrame = dataset match {
    case "financebench" => QaSources.financeBench(spark, path, limit)
    case "finqa" => QaSources.finqa(spark, path, limit)
    case other => throw new IllegalArgumentException(
      s"unknown dataset '$other' (expected financebench | finqa)")
  }
}
