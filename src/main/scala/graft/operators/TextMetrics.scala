package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Tokenizer

/** Answer-quality text metrics (SURVEY.md §5): the reference scores
  * generated answers with BERTScore P/R/F1, a simplified BARTScore, and
  * FinBERT cosine similarity (scores/text_evaluation_metrics.py:20-283).
  *
  * Model-based scorers need transformer weights that are NOT available in
  * this offline environment — [[EmbeddingScorer]] is the documented
  * interface stub for them. The engine ships [[TokenOverlapScorer]], a
  * deterministic lexical stand-in with the same output contract
  * (precision/recall/F1 per candidate-reference pair), so the metrics
  * *dataflow* (pairing, scoring, aggregation) is fully exercised.
  */
object TextMetrics {

  /** Contract of a model-based scorer (BERTScore/FinBERT shape). An
    * implementation would embed both texts and compute token-alignment
    * similarities; it plugs into [[scoreAnswers]] unchanged. */
  trait EmbeddingScorer extends Serializable {
    /** (precision, recall, f1) for candidate vs reference. */
    def score(candidate: String, reference: String): (Double, Double, Double)
  }

  /** Deterministic lexical scorer: token-set precision/recall/F1 —
    * the degenerate (identity-embedding) case of BERTScore. */
  object TokenOverlapScorer extends EmbeddingScorer {
    def score(candidate: String, reference: String): (Double, Double, Double) = {
      val c = Tokenizer.tokens(candidate).toSet
      val r = Tokenizer.tokens(reference).toSet
      if (c.isEmpty || r.isEmpty) return (0.0, 0.0, 0.0)
      val overlap = (c & r).size.toDouble
      val p = overlap / c.size
      val rec = overlap / r.size
      val f1 = if (p + rec > 0) 2 * p * rec / (p + rec) else 0.0
      (p, rec, f1)
    }
  }

  /** A REAL (deterministic) embedding model through the
    * [[EmbeddingScorer]] seam — the BERTScore-shaped dataflow with a
    * seeded random-projection token embedding instead of transformer
    * weights (which are offline-unavailable; swapping them in changes
    * only [[mask]]). Each distinct token embeds to a `dims`-bit
    * Rademacher sign vector: bit k is the low bit of the engine's
    * hash-family derivation fmix64(xxh64(token) ^ k·GOLDEN) — the SAME
    * mix the MinHash/CMS kernels use, so DuckDB replays the embedding
    * bit-for-bit through the existing [[graft.core.XxHashSql]] chains.
    * Scores are BERTScore's greedy alignment: precision = mean over
    * candidate tokens of the max cosine to any reference token (recall
    * symmetric, F1 harmonic). For ±1 vectors, cos(c, r) =
    * (dims − 2·popcount(mask_c xor mask_r)) / dims — integer
    * arithmetic until one final division, which is what keeps the
    * cross-engine replay exact. Scores live in [−1, 1] like raw
    * (un-baselined) BERTScore. */
  final class RandomProjectionScorer(dims: Int) extends EmbeddingScorer {
    require(dims >= 1 && dims <= 64, "mask packs into one Long")

    private def mask(t: String): Long = {
      val base = graft.functions.HashKernel.xxh64(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      var m = 0L
      var k = 0
      while (k < dims) {
        if ((graft.functions.Mix.fmix64(
            base ^ (k * 0x9E3779B97F4A7C15L)) & 1L) == 0L) m |= 1L << k
        k += 1
      }
      m
    }

    /** sum over `a` of max-dot against `b`, divided once at the end —
      * the only float op, mirrored verbatim by the oracle SQL. */
    private def side(a: Array[Long], b: Array[Long]): Double = {
      var s = 0L
      var i = 0
      while (i < a.length) {
        var minH = dims
        var j = 0
        while (j < b.length) {
          val h = java.lang.Long.bitCount(a(i) ^ b(j))
          if (h < minH) minH = h
          j += 1
        }
        s += dims - 2 * minH
        i += 1
      }
      s / (dims.toDouble * a.length)
    }

    def score(candidate: String, reference: String): (Double, Double, Double) = {
      val ct = Tokenizer.tokens(candidate).distinct
      val rt = Tokenizer.tokens(reference).distinct
      if (ct.isEmpty || rt.isEmpty) return (0.0, 0.0, 0.0)
      val cm = ct.map(mask).toArray
      val rm = rt.map(mask).toArray
      val p = side(cm, rm)
      val r = side(rm, cm)
      val f1 = if (p + r > 0) 2 * p * r / (p + r) else 0.0
      (p, r, f1)
    }
  }

  /** Per-pair scores through the mapPartitions seam, keyed — the
    * [[scoreAnswersWith]] dataflow WITHOUT the aggregation, so callers
    * can fold the means in a fixed key order (replay-exact across
    * engines/partitionings). */
  def scorePairsWith(scorer: EmbeddingScorer, answers: DataFrame,
      candidateCol: String, referenceCol: String,
      keyCol: String): DataFrame = {
    val spark = answers.sparkSession
    import spark.implicits._
    answers
      .select(col(keyCol).cast("long"),
        coalesce(col(candidateCol).cast("string"), lit("")),
        coalesce(col(referenceCol).cast("string"), lit("")))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        // per-partition scorer init point (weights load would go here)
        it.map { case (k, c, r) =>
          val (p, rec, f1) = scorer.score(c, r)
          (k, p, rec, f1)
        }
      }
      .toDF(keyCol, "precision", "recall", "f1")
  }

  /** Column form of the lexical scorer (codegen-free but set-based —
    * fine off the hot path; model scorers would use mapPartitions). */
  def lexicalPRF(candidate: Column, reference: Column): Column = {
    // null text scores like empty text — (0,0,0) — instead of a null
    // recall that avg() would silently drop from the mean
    def toks(c: Column) =
      array_distinct(graft.functions.TextFunctions.regex_tokens(
        coalesce(c, lit(""))))
    val c = toks(candidate)
    val r = toks(reference)
    val overlap = size(array_intersect(c, r)).cast("double")
    val p = when(size(c) > 0, overlap / size(c)).otherwise(0.0)
    val rec = when(size(r) > 0, overlap / size(r)).otherwise(0.0)
    val f1 = when(p + rec > 0, lit(2.0) * p * rec / (p + rec)).otherwise(0.0)
    struct(round(p, 6).as("precision"), round(rec, 6).as("recall"),
      round(f1, 6).as("f1"))
  }

  /** Block size of the ordered corpus-mean fold — shared with the
    * DuckDB replays of the qa_answer_prf / qa_embed_score means. */
  private[graft] val MeanBlock = 256L

  /** Score answers against references and aggregate (the reference's
    * metric-summary shape: mean P/R/F1 over the dataset).
    *
    * With an order column the means fold on a fixed TWO-LEVEL tree —
    * id order within [[MeanBlock]]-sized id blocks, blk order across —
    * so the float result is reproducible across engines/partitionings
    * AND no fold buffers the whole corpus (a single global
    * `ordered_sum` group collects one struct per answer — the
    * corpus-proportional-state cliff). Without an order column: plain
    * order-tolerant `avg`, the 100 TB default. */
  def scoreAnswers(answers: DataFrame, candidateCol: String,
      referenceCol: String, orderCols: Column*): DataFrame = {
    val m = answers
      .withColumn("m", lexicalPRF(col(candidateCol), col(referenceCol)))
    if (orderCols.isEmpty)
      m.agg(
        count(lit(1)).as("n"),
        round(avg(col("m.precision")), 6).as("mean_precision"),
        round(avg(col("m.recall")), 6).as("mean_recall"),
        round(avg(col("m.f1")), 6).as("mean_f1"))
    else {
      require(orderCols.length == 1,
        "ordered corpus mean needs exactly one unique id column")
      val id = orderCols.head
      import graft.functions.TextFunctions.ordered_sum
      // integer `div` keeps the block id exact for any non-negative long id
      // (double-division would lose precision above 2^53)
      m.groupBy(call_function("div", id.cast("long"), lit(MeanBlock)).as("blk"))
        .agg(count(lit(1)).as("bn"),
          ordered_sum(col("m.precision"), id).as("bp"),
          ordered_sum(col("m.recall"), id).as("br"),
          ordered_sum(col("m.f1"), id).as("bf"))
        .agg(
          sum(col("bn")).as("n"),
          round(ordered_sum(col("bp"), col("blk")) / sum(col("bn")), 6)
            .as("mean_precision"),
          round(ordered_sum(col("br"), col("blk")) / sum(col("bn")), 6)
            .as("mean_recall"),
          round(ordered_sum(col("bf"), col("blk")) / sum(col("bn")), 6)
            .as("mean_f1"))
    }
  }

  /** The model-scorer path: the same pairing/aggregation dataflow with a
    * pluggable [[EmbeddingScorer]] evaluated per partition — the shape a
    * real BERTScore/FinBERT scorer needs (load weights once per
    * partition, batch texts through them). With [[TokenOverlapScorer]]
    * this equals [[scoreAnswers]] exactly (spec-pinned), so swapping in
    * a model scorer changes only the kernel, not the dataflow. */
  def scoreAnswersWith(scorer: EmbeddingScorer, answers: DataFrame,
      candidateCol: String, referenceCol: String): DataFrame = {
    val spark = answers.sparkSession
    import spark.implicits._
    // Null texts degrade to zero scores on the column path (lexicalPRF);
    // coalesce here so the two dataflows stay equivalent instead of the
    // scorer NPE-ing on a null candidate/reference.
    val scored = answers
      .select(coalesce(col(candidateCol).cast("string"), lit("")),
        coalesce(col(referenceCol).cast("string"), lit("")))
      .as[(String, String)]
      .mapPartitions { it =>
        // per-partition scorer init point (weights load would go here)
        it.map { case (c, r) => scorer.score(c, r) }
      }
      .toDF("precision", "recall", "f1")
    scored.agg(
      count(lit(1)).as("n"),
      round(avg(round(col("precision"), 6)), 6).as("mean_precision"),
      round(avg(round(col("recall"), 6)), 6).as("mean_recall"),
      round(avg(round(col("f1"), 6)), 6).as("mean_f1"))
  }
}
