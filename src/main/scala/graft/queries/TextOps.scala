package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.functions.Tokenizer

/** Text-kernel operator coverage (SURVEY.md §2.4 chunking, §2.6 truncation,
  * C1–C4, T1–T5) over the `documents` table.
  *
  * The tokenizer rule is deliberately RE2-expressible
  * (`Tokenizer.DuckDbTokenRegex`), so token counting — and everything
  * derived from counts (chunk counts, truncation budgets) — has an exact
  * DuckDB oracle. Chunk *contents* are verified by property tests instead
  * (reconstruction + overlap invariants in TokenizerSpec).
  *
  * Scale: `count_tokens` is a codegen'd scalar inside whole-stage codegen —
  * per-doc cost is one linear scan, no shuffle. `split_chunks` is a
  * Generator: explode happens partition-local; downstream groupBy(doc_id)
  * aggregations shuffle only (doc_id, small ints), never chunk text.
  */
object TextOps extends graft.QueryModule {

  private val ChunkSize = 64
  private val ChunkOverlap = 16
  private val CharChunkSize = 200
  private val TruncateMax = 100

  /** C4: token counting + the 1.15x estimate, per document. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.loadSpread(spark, dir, "documents")
      .select($"doc_id",
        count_tokens($"text").as("n_tokens"),
        estimate_tokens($"text").as("est_tokens"))
  }

  /** C1–C3: chunk explosion, aggregated back per doc so the oracle can use
    * the closed-form chunk-count formula. */
  def chunkStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.loadSpread(spark, dir, "documents")
      .select($"doc_id",
        split_chunks($"text", lit(ChunkSize), lit(ChunkOverlap)))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum($"token_count").cast("long").as("total_chunk_tokens"),
        max($"token_count").as("max_chunk_tokens"),
        min($"token_count").as("min_chunk_tokens"))
  }

  /** C2: character-costed split mode, aggregated per doc. Separator ' '
    * makes units words on this corpus; size includes the joiners, so a
    * chunk is the longest unit run whose re-joined string fits
    * `CharChunkSize` chars (one oversized unit stays whole, like
    * CharacterTextSplitter). The oracle replays the same greedy pack as a
    * recursive CTE over unit-length prefix sums — validated against an
    * independent implementation. */
  def chunkCharsStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.loadSpread(spark, dir, "documents")
      .select($"doc_id",
        split_chunks_chars($"text", lit(CharChunkSize), lit(0), lit(" ")))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum($"token_count").cast("long").as("total_units"),
        max(length($"chunk_text")).cast("long").as("max_chunk_chars"),
        sum(length($"chunk_text")).cast("long").as("total_chunk_chars"))
  }

  /** T1/T4/T5: truncation with stats struct; `retokenized` re-counts the
    * truncated text so the oracle proves the cut landed on a token
    * boundary (retokenized == least(n, max)). */
  def truncateStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.loadSpread(spark, dir, "documents")
      .withColumn("t", truncate_tokens($"text", lit(TruncateMax), lit("start")))
      .select($"doc_id",
        $"t.original_tokens".as("original_tokens"),
        $"t.truncated_tokens".as("truncated_tokens"),
        round($"t.retention_rate", 4).as("retention_rate"),
        $"t.truncation_applied".as("truncation_applied"),
        count_tokens($"t.text").as("retokenized"))
  }

  /** Token-count lower-bound filter — the [[graft.plans.TokenFilterStrengthen]]
    * target shape: sessions with GraftExtensions get a derived
    * `length(text) > n` conjunct evaluated BEFORE the tokenizer scan
    * (plain load, not loadSpread, so the strengthened filter sits directly
    * on the scan). Result is rule-independent (the rewrite is an
    * equivalence); PlanSpec asserts the plan shape. */
  def longDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(count_tokens($"text") > 80)
      .select($"doc_id", count_tokens($"text").as("n_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_count" -> tokenCount,
    "text_chunk_stats" -> chunkStats,
    "text_chunk_chars_stats" -> chunkCharsStats,
    "text_truncate_stats" -> truncateStats,
    "text_long_docs" -> longDocs,
  )

  private val tokExpr =
    s"len(regexp_extract_all(text, '${Tokenizer.DuckDbTokenRegex}'))"

  val oracleSql: Map[String, String] = Map(
    "text_token_count" ->
      s"""SELECT doc_id, $tokExpr AS n_tokens,
         |  CAST(ceil($tokExpr * 1.15) AS INT) AS est_tokens
         |FROM documents""".stripMargin,
    "text_chunk_stats" ->
      s"""WITH t AS (SELECT doc_id, $tokExpr AS n FROM documents
         |           WHERE $tokExpr > 0),
         |c AS (SELECT doc_id, n,
         |  CASE WHEN n <= $ChunkSize THEN 1
         |       ELSE 1 + CAST(ceil((n - $ChunkSize) / ${ChunkSize - ChunkOverlap}.0) AS INT)
         |  END AS n_chunks FROM t)
         |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
         |  CAST((n_chunks - 1) * $ChunkSize
         |       + (n - (n_chunks - 1) * ${ChunkSize - ChunkOverlap}) AS BIGINT)
         |    AS total_chunk_tokens,
         |  CASE WHEN n >= $ChunkSize THEN $ChunkSize ELSE n END AS max_chunk_tokens,
         |  CASE WHEN n_chunks = 1 THEN n
         |       ELSE least($ChunkSize, n - (n_chunks - 1) * ${ChunkSize - ChunkOverlap})
         |  END AS min_chunk_tokens
         |FROM c""".stripMargin,
    "text_chunk_chars_stats" ->
      s"""WITH RECURSIVE docs AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), u -> len(u) > 0) AS us
         |  FROM documents),
         |pre AS (
         |  SELECT doc_id,
         |    unnest(range(1, len(us) + 1)) AS i,
         |    unnest(list_transform(range(1, len(us) + 1),
         |      j -> CAST(len(us[j]) + 1 AS BIGINT))) AS c1
         |  FROM docs WHERE len(us) > 0),
         |pre2 AS (
         |  SELECT doc_id, i, sum(c1) OVER (PARTITION BY doc_id ORDER BY i) AS p
         |  FROM pre),
         |rec AS (
         |  SELECT doc_id, 0 AS idx, 1 AS a FROM docs WHERE len(us) > 0
         |  UNION ALL
         |  SELECT r.doc_id, r.idx + 1,
         |    coalesce((SELECT max(pr.i) FROM pre2 pr WHERE pr.doc_id = r.doc_id
         |        AND pr.p - coalesce((SELECT p2.p FROM pre2 p2
         |                             WHERE p2.doc_id = r.doc_id AND p2.i = r.a - 1), 0)
         |            - 1 <= $CharChunkSize), r.a) + 1 AS a
         |  FROM rec r
         |  WHERE r.a <= (SELECT max(i) FROM pre2 pr WHERE pr.doc_id = r.doc_id)),
         |chunks AS (
         |  SELECT r.doc_id, r.idx, r.a,
         |    greatest(r.a,
         |      coalesce((SELECT max(pr.i) FROM pre2 pr WHERE pr.doc_id = r.doc_id
         |        AND pr.p - coalesce((SELECT p2.p FROM pre2 p2
         |                             WHERE p2.doc_id = r.doc_id AND p2.i = r.a - 1), 0)
         |            - 1 <= $CharChunkSize), r.a)) AS b
         |  FROM rec r
         |  WHERE r.a <= (SELECT max(i) FROM pre2 pr WHERE pr.doc_id = r.doc_id))
         |SELECT c.doc_id, count(*) AS n_chunks,
         |  CAST(sum(c.b - c.a + 1) AS BIGINT) AS total_units,
         |  CAST(max((SELECT p FROM pre2 x WHERE x.doc_id = c.doc_id AND x.i = c.b)
         |      - coalesce((SELECT p FROM pre2 x
         |                  WHERE x.doc_id = c.doc_id AND x.i = c.a - 1), 0) - 1)
         |    AS BIGINT) AS max_chunk_chars,
         |  CAST(sum((SELECT p FROM pre2 x WHERE x.doc_id = c.doc_id AND x.i = c.b)
         |      - coalesce((SELECT p FROM pre2 x
         |                  WHERE x.doc_id = c.doc_id AND x.i = c.a - 1), 0) - 1)
         |    AS BIGINT) AS total_chunk_chars
         |FROM chunks c GROUP BY c.doc_id""".stripMargin,
    "text_long_docs" ->
      s"""SELECT doc_id, $tokExpr AS n_tokens
         |FROM documents WHERE $tokExpr > 80""".stripMargin,
    "text_truncate_stats" ->
      s"""SELECT doc_id, n AS original_tokens,
         |  least(n, $TruncateMax) AS truncated_tokens,
         |  CASE WHEN n = 0 THEN 1.0
         |       ELSE round(least(n, $TruncateMax) * 1.0 / n, 4) END AS retention_rate,
         |  n > $TruncateMax AS truncation_applied,
         |  least(n, $TruncateMax) AS retokenized
         |FROM (SELECT doc_id, $tokExpr AS n FROM documents)""".stripMargin,
  )
}
