package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Unigram-LM subword tokenizer training by hard (Viterbi) EM — the
  * SentencePiece-style companion to [[Bpe]]: instead of greedy merges,
  * pick a piece inventory, give each piece a probability, and let every
  * word choose its maximum-likelihood segmentation; usage counts then
  * re-estimate the probabilities (Kudo 2018). Like the BPE trainer, the
  * reference has no tokenizer-training stage; this is the corpus-scale
  * shape a pretraining pipeline needs.
  *
  * Engine-reproducible by construction, so every round is SQL-replayable:
  *  - the SEED inventory is deterministic: all substrings up to
  *    [[graft.queries.AnalysisQueries]]'s configured piece length,
  *    occurrence-weighted by word frequency; the top-V multi-character
  *    pieces by (freq DESC, piece ASC) plus every single character (the
  *    coverage guarantee);
  *  - probabilities are integer-count ratios evaluated once as double
  *    divisions, and the Viterbi recurrence multiplies doubles in a fixed
  *    order — +,*,/ only (IEEE-exact), no logs, so scores are
  *    bit-identical across engines (the [[LinearModel]] softsign
  *    argument applied to EM);
  *  - Viterbi ties break to the LONGER last piece, a total order.
  *
  * Scale shape (the BPE discipline): everything runs on the WORD
  * VOCABULARY table (distinct words + counts — dimension-sized next to
  * the corpus, cached once); per round the only driver traffic is the
  * piece table (V rows, a query parameter). The Viterbi kernel is a
  * closure over the broadcast piece map — per-word bounded work
  * (len × maxPieceLen), the same budget class as the k-means assignment
  * UDF. The one unpartitioned window ranks the SEED PIECE table
  * (bounded: V is a parameter, the candidate pool is dimension-sized). */
object UnigramLm {

  /** Distinct-word vocabulary with counts from a tokenized corpus. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokensOf(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))

  /** Occurrence-weighted substring seed frequencies: every (start, len)
    * substring up to `maxPieceLen`, each occurrence counting the word's
    * corpus frequency. */
  def seedFrequencies(vocabDf: DataFrame, maxPieceLen: Int): DataFrame =
    vocabDf.select(col("wc"), explode(expr(
      s"""flatten(transform(sequence(1, length(word)), i ->
         |  transform(sequence(1, least($maxPieceLen, length(word) - i + 1)),
         |            l -> substr(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("freq"))

  /** Seed inventory: top-V multi-char pieces by (freq DESC, piece ASC)
    * plus all single characters. */
  def seedPieces(vocabDf: DataFrame, maxPieceLen: Int, topV: Int): DataFrame = {
    val freqs = seedFrequencies(vocabDf, maxPieceLen)
    val multi = freqs.filter(length(col("piece")) >= 2)
      .withColumn("rk", row_number().over(
        Window.partitionBy().orderBy(col("freq").desc, col("piece").asc)))
      .filter(col("rk") <= topV).drop("rk")
    multi.unionAll(freqs.filter(length(col("piece")) === 1))
  }

  /** Viterbi segmentation of one word under a piece->prob map:
    * dp(i) = max over l of dp(i-l) * p(word[i-l+1 .. i]), ties to the
    * larger l. Returns the piece list (empty only if some character is
    * not in the map — excluded by the coverage guarantee). */
  private def viterbi(word: String, probs: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    val dp = Array.fill(n + 1)(-1.0)
    val back = Array.fill(n + 1)(0)
    dp(0) = 1.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        if (dp(i - l) >= 0.0) {
          probs.get(word.substring(i - l, i)) match {
            case Some(p) =>
              val s = dp(i - l) * p
              if (s > dp(i) || (s == dp(i) && l > back(i))) {
                dp(i) = s; back(i) = l
              }
            case None =>
          }
        }
        l += 1
      }
      i += 1
    }
    if (dp(n) < 0.0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      out.prepend(word.substring(pos - back(pos), pos))
      pos -= back(pos)
    }
    out.toSeq
  }

  /** `rounds` hard-EM passes over the cached vocabulary; returns the
    * final segmentation table (word, wc, pieces). The caller persists
    * `vocabDf`. Pieces that lose every occurrence between rounds drop
    * out of the model on both engines (usage join semantics). */
  def train(vocabDf: DataFrame, maxPieceLen: Int, topV: Int,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "unigram EM needs at least one round")
    // seed probs: integer freqs of the selected inventory, one double
    // division each — the only float op outside the Viterbi products
    val seed = seedPieces(vocabDf, maxPieceLen, topV)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var probs: Map[String, Double] = {
      val total = seed.map(_._2).sum.toDouble
      seed.map { case (p, f) => p -> f.toDouble / total }.toMap
    }
    def segmented: DataFrame = {
      val pMap = probs
      val mpl = maxPieceLen
      val segUdf = udf { (word: String) => viterbi(word, pMap, mpl) }
      vocabDf.select(col("word"), col("wc"), segUdf(col("word")).as("pieces"))
    }
    var r = 1
    while (r < rounds) {
      // E-step usage -> M-step probs; usage is an integer aggregate
      // (bounded output: at most |inventory| rows reach the driver)
      val usage = segmented
        .select(col("wc"), explode(col("pieces")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("u"))
        .collect().map(x => x.getString(0) -> x.getLong(1))
      val total = usage.map(_._2).sum.toDouble
      probs = usage.map { case (p, u) => p -> u.toDouble / total }.toMap
      r += 1
    }
    segmented
  }
}
