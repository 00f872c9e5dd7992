package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.Tokenizer

/** The reference's MapReduce QA dataflow, re-expressed as one declarative
  * Spark plan (reference pipeline shape: src/core/mapreduce_pipeline.py —
  * chunk fan-out :252-268, score filter via formatters, per-QA gather
  * :151-166, reduce :270-286, stats :335-356).
  *
  * Stages (all lazy DataFrames — Catalyst sees the whole graph):
  *   documents --split_chunks--> chunks --map--> scored --filter-->
  *   survivors --groupBy(doc)--> reduced answers + filtering stats
  *
  * The reference's LLM call is abstracted as a [[TextModel]]. The default
  * [[ExtractiveModel]] is *column-based*: map/score/reduce are Catalyst
  * expressions, so the whole pipeline stays inside whole-stage codegen and
  * is deterministic (testable against a DuckDB oracle with no network).
  * An external-model adapter would implement [[TextModel]] with
  * `mapPartitions` + connection reuse instead (SURVEY.md §2.11) — the
  * surrounding dataflow is unchanged.
  *
  * Scale notes: chunk explosion is partition-local (no shuffle); the map
  * phase is a scalar projection; the only shuffle is groupBy(doc_id), and
  * what shuffles is (doc_id, score, small ints, one surviving chunk's
  * tokens) — never the full document text. At 100 TB the chunk table is
  * the big one; AQE coalesces the tiny post-aggregation partitions.
  */
trait TextModel {
  /** Relevance score (0-10) of a chunk's tokens against question tokens. */
  def score(chunkTokens: Column, questionTokens: Column): Column
  /** Per-chunk extractive answer content, given the chunk's tokens. */
  def content(chunkTokens: Column): Column
  /** M8 question improvement (base_pipeline.py:521-630: the LLM rewrites
    * the question before the map stage). Default: whitespace-normalize
    * and guarantee a trailing '?' — the extractive stand-in. A custom
    * model overrides this to reach the question stage, same as it reaches
    * map/reduce. Returning null signals parse failure; the pipeline falls
    * back to the original question. */
  def improve(question: Column): Column = {
    val t = trim(regexp_replace(question, "\\s+", " "))
    when(t.endsWith("?"), t).otherwise(concat(t, lit("?")))
  }

  /** P7/O5 judge (the reference's separate judge LLM,
    * async_evaluation.py + judge_prompt.yml's 5-way scale). Inputs are
    * the reduce outcome: the 0-10-scaled best score and the surviving
    * chunk count (0 => the canned no-answer row). Default: the
    * deterministic score-band stand-in. */
  def judge(bestScore: Column, chunksAfter: Column): Column =
    when(chunksAfter === 0, "No answer")
      .when(bestScore >= 4, "Correct")
      .when(bestScore === 3, "Coherent")
      .when(bestScore === 2, "Deviated")
      .otherwise("Incorrect")
}

/** Deterministic extractive scorer: score = |distinct chunk tokens ∩
  * question tokens| capped at 10; content = space-joined chunk tokens. */
object ExtractiveModel extends TextModel {
  def score(chunkTokens: Column, questionTokens: Column): Column =
    least(lit(10), size(array_intersect(array_distinct(chunkTokens), questionTokens)))
  def content(chunkTokens: Column): Column = concat_ws(" ", chunkTokens)
}

/** Formatter semantics (reference factory.py:56-87 format dispatch):
  * score scale + filter threshold + reduce-input shape per format.
  *  - json:   0-10 scale, threshold 5, XML-wrapped reduce input
  *            (json_formatter.py:17-34, 36-98)
  *  - plain:  0-100 scale, threshold 50, newline concat
  *            (plain_text_formatter.py:18-56)
  *  - hybrid: 0-10 scale, threshold 5, newline concat
  *            (hybrid_formatter.py:17-60) */
sealed abstract class QaFormat(
    val scoreScale: Int, val defaultThreshold: Int, val xmlReduce: Boolean) {
  require(scoreScale > 0, s"scoreScale must be positive, got $scoreScale")
  /** 0-10 -> format scale. Exact for any scale (25 -> x2.5, not the
    * truncated x2); stays an INT literal when the factor is whole so
    * the built-in 10/100 formats keep their integer score schema. */
  def scaleUp(score: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = scoreScale / 10.0
    if (f == Math.floor(f)) score * org.apache.spark.sql.functions.lit(f.toInt)
    else score * org.apache.spark.sql.functions.lit(f)
  }
  /** format scale -> 0-10 (double division: scale 25 divides by 2.5,
    * scale 9 doesn't divide by zero). Spark's Divide returns double
    * either way, so the 10/100 formats' result schema is unchanged. */
  def scaleDown(score: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    score / org.apache.spark.sql.functions.lit(scoreScale / 10.0)
}
object QaFormat {
  case object Json extends QaFormat(10, 5, true)
  case object Plain extends QaFormat(100, 50, false)
  case object Hybrid extends QaFormat(10, 5, false)
}

/** @param chunkSize   tokens per chunk (reference default 32768; small here
  *                    so the synthetic docs actually produce fan-out)
  * @param overlap     overlapping tokens between consecutive chunks
  * @param threshold   keep map results with score > threshold (strict >,
  *                    matching json_formatter.py:32)
  * @param question    the (constant) question text driving relevance
  * @param format      formatter semantics (score scale / reduce shape)
  */
case class MapReduceConfig(
    chunkSize: Int = 64,
    overlap: Int = 16,
    threshold: Int = 1,
    question: String = "spark query join data",
    format: QaFormat = QaFormat.Hybrid)

object MapReducePipeline {
  /** Default M8 rewriter (the [[TextModel]] default `improve`), kept as a
    * standalone function for callers outside a pipeline. */
  val defaultImprover: Column => Column = ExtractiveModel.improve

  /** O5 positional judge batching (async_evaluation.py:260, :389-404):
    * global position over `order` -> batches of `size`, 1-based item
    * numbers. Shared by the map-reduce and truncation judge paths. Uses
    * [[graft.operators.GlobalOrder]] (range partition + local numbering),
    * not a bare `Window.orderBy`, so no single task sees all rows. */
  def positionalBatches(df: DataFrame, order: Column, size: Int = 5): DataFrame =
    graft.operators.GlobalOrder.withRowNumber(df, order)
      .withColumn("batch_id", floor((col("rn") - 1) / size).cast("long"))
      .withColumn("item_number", ((col("rn") - 1) % size + 1).cast("int"))
      .drop("rn")
}

class MapReducePipeline(cfg: MapReduceConfig, model: TextModel = ExtractiveModel) {

  /** Tokens of the question, as a literal array column (driver-side
    * tokenization — the question is a scalar, not data). */
  private val questionTokens: Column =
    array(Tokenizer.tokens(cfg.question).distinct.map(lit).toIndexedSeq: _*)
      .cast("array<string>") // empty question => array<null> otherwise

  /** Token regex shared with the DuckDB oracle. Applied to chunk_text with
    * Spark's codegen'd regexp_extract_all — identical semantics to the
    * scanner (property-tested). */
  private val chunkTokens: Column =
    graft.functions.TextFunctions.regex_tokens(col("chunk_text"))

  /** Stage 1-2: explode documents into scored chunks (M1 + map). Scores
    * are scaled to the format's range (0-10 json/hybrid, 0-100 plain). */
  def mapped(documents: DataFrame): DataFrame = {
    val d = documents
    d.select(col("doc_id"),
        split_chunks(col("text"), lit(cfg.chunkSize), lit(cfg.overlap)))
      .withColumn("ctoks", chunkTokens)
      .withColumn("score",
        cfg.format.scaleUp(model.score(col("ctoks"), questionTokens)))
      .withColumn("content", model.content(col("ctoks")))
      .drop("ctoks", "chunk_text")
  }

  /** M4: XML-wrapped reduce-input item `<chunk_i>escaped</chunk_i>` with
    * the 5-entity escape (json_formatter.py:36-98). */
  private def xmlItem(idx: Column, content: Column): Column = {
    val escaped = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
      "\"" -> "&quot;", "'" -> "&apos;")
      .foldLeft(content) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    concat(lit("<chunk_"), idx, lit(">"), escaped, lit("</chunk_"), idx, lit(">"))
  }

  /** Stage 3-5: filter (P4), gather per doc (M3), ordered reduce input
    * (M4/M5/O1), extractive reduce + error-row fabrication (M6/M7/P9),
    * filtering stats (A7/A9). One shuffle. */
  def answers(documents: DataFrame): DataFrame = {
    val m = mapped(documents)
    val surviving = col("score") > cfg.threshold
    // single-column ordering key: best score first, then lowest chunk_idx
    // (chunk_idx < 1e6 by construction at sane chunk sizes)
    val ord = col("score") * 1000000L - col("chunk_idx")
    m.groupBy(col("doc_id")).agg(
      count(lit(1)).as("chunks_before"),
      sum(when(surviving, 1).otherwise(0)).as("chunks_after"),
      max(col("score")).as("best_score"),
      // M4/M5: reduce input = surviving contents in chunk order —
      // XML-wrapped items (json format) or bare concat (plain/hybrid)
      array_join(
        transform(
          array_sort(collect_list(when(surviving,
            struct(col("chunk_idx"), col("content"))))),
          x => if (cfg.format.xmlReduce) xmlItem(x("chunk_idx"), x("content"))
               else x("content")),
        "\n").as("reduce_input"),
      max_by(when(surviving, col("content")), when(surviving, ord))
        .as("top_content"))
      .withColumn("retention_rate",
        round(col("chunks_after") / col("chunks_before"), 4))
      // P9: error-row fabrication — no surviving chunk => canned answer
      .withColumn("llm_answer",
        coalesce(col("top_content"), lit("No answer found in document")))
      .drop("top_content")
  }

  /** M8: optional question-improvement pre-map stage (reference:
    * base_pipeline.py:521-630) — rewrites `question`, keeps
    * `original_question`, falls back to the original when the rewriter
    * yields null (the reference's parse-failure fallback). Routes through
    * THE PIPELINE'S MODEL by default, so a custom [[TextModel]] reaches
    * this stage exactly like it reaches map/reduce; pass `improve` to
    * override ad hoc. */
  def improveQuestions(qa: DataFrame): DataFrame =
    improveQuestions(qa, model.improve)

  def improveQuestions(qa: DataFrame, improve: Column => Column): DataFrame =
    qa.withColumn("original_question", col("question"))
      .withColumn("question", coalesce(improve(col("question")), col("question")))

  /** Judge input blocks (FIXTURES.md §6 shape; async_evaluation.py:60-83):
    * batches of 5 docs -> one XML block per batch, items ordered by
    * position, 5-entity-escaped answers. */
  def judgeBlocks(documents: DataFrame): DataFrame = {
    val j = judged(documents)
    val item = concat(lit("<qa_pair id=\""), col("item_number"), lit("\"><answer>"),
      Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
        "\"" -> "&quot;", "'" -> "&apos;")
        .foldLeft(col("llm_answer")) { case (c, (f, t)) => replace(c, lit(f), lit(t)) },
      lit("</answer></qa_pair>"))
    j.withColumn("item", item)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_items"),
        array_join(
          transform(array_sort(collect_list(struct(col("item_number"), col("item")))),
            x => x("item")),
          "\n").as("judge_block"))
  }

  /** Answers + judgment, WITHOUT positional batching — for analytics
    * that aggregate judgments and never look at batch keys; skips the
    * global-order pass entirely. Judgment routed through the MODEL's
    * judge slot (5-way as in config/prompts/judge_prompt.yml) — a custom
    * [[TextModel]] supplies its own judge exactly like its own map/
    * reduce. */
  def judgedAnswers(documents: DataFrame): DataFrame =
    answers(documents).withColumn("judgment",
      // judge's contract is the 0-10 scale; best_score carries the
      // FORMAT's scale (0-100 for plain), so normalize before the
      // bands — without this every plain-format doc scoring >= 40/100
      // judged "Correct" and the middle bands were unreachable
      model.judge(
        if (cfg.format.scoreScale == 10) col("best_score")
        else cfg.format.scaleDown(col("best_score")),
        col("chunks_after")))

  /** Judge stage (O5 positional batching + P7 normalization): batches of
    * 5 docs by doc_id order on top of [[judgedAnswers]]. */
  def judged(documents: DataFrame): DataFrame =
    MapReducePipeline.positionalBatches(judgedAnswers(documents), col("doc_id"))
}
