package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed core lineage (SURVEY.md §1.2: typed `Dataset[T]` for the qa ->
  * chunks -> map results -> answers -> judgments flow; untyped DataFrame
  * for the dynamic stats layer). The case classes declare the engine's
  * row contracts explicitly — the reference's schema-on-read dicts made
  * these shapes implicit (FIXTURES.md §1-§6).
  */
object Schemas {

  /** FinanceBench-shaped QA record, post-projection (FIXTURES.md §1). */
  case class QaRecord(
      doc_name: String,
      question: String,
      answer: String,
      justification: String,
      evidence: Seq[String],
      question_type: String,
      question_reasoning: String)

  /** A chunk produced by split_chunks (FIXTURES.md §3). */
  case class Chunk(
      doc_id: Long,
      chunk_idx: Int,
      chunk_text: String,
      token_count: Int)

  /** Scored map-phase output (FIXTURES.md §4, plain/hybrid shape). */
  case class MapResult(
      doc_id: Long,
      chunk_idx: Int,
      token_count: Int,
      score: Int,
      content: String)

  /** Reduced per-document answer + filtering stats (FIXTURES.md §5 + A7). */
  case class Answer(
      doc_id: Long,
      chunks_before: Long,
      chunks_after: Long,
      best_score: Int,
      reduce_input: String,
      retention_rate: Double,
      llm_answer: String)

  /** Judged answer with positional batch assignment (FIXTURES.md §6). */
  case class Judged(
      doc_id: Long,
      chunks_before: Long,
      chunks_after: Long,
      best_score: Int,
      reduce_input: String,
      retention_rate: Double,
      llm_answer: String,
      judgment: String,
      batch_id: Long,
      item_number: Int)

  implicit val qaEncoder: Encoder[QaRecord] = Encoders.product[QaRecord]
  implicit val chunkEncoder: Encoder[Chunk] = Encoders.product[Chunk]
  implicit val mapResultEncoder: Encoder[MapResult] = Encoders.product[MapResult]
  implicit val answerEncoder: Encoder[Answer] = Encoders.product[Answer]
  implicit val judgedEncoder: Encoder[Judged] = Encoders.product[Judged]
}

/** Typed views over the pipeline stages — compile-time field checks for
  * library consumers; the underlying plans are identical. */
object TypedPipeline {
  import Schemas._

  def mapResults(df: org.apache.spark.sql.DataFrame): Dataset[MapResult] =
    df.as[MapResult]
  def answers(df: org.apache.spark.sql.DataFrame): Dataset[Answer] =
    df.as[Answer]
  def judged(df: org.apache.spark.sql.DataFrame): Dataset[Judged] =
    df.as[Judged]
}
