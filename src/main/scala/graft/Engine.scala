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
}

object Engine {
  /** Dataset registry (factory.py:203-220 register_dataset analog). */
  def loadDataset(spark: SparkSession, dataset: String, path: String,
      limit: Option[Int] = None): DataFrame = dataset match {
    case "financebench" => QaSources.financeBench(spark, path, limit)
    case "finqa" => QaSources.finqa(spark, path, limit)
    case other => throw new IllegalArgumentException(
      s"unknown dataset '$other' (expected financebench | finqa)")
  }
}
