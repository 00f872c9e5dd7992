package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, UnigramLm}

/** Contracts for the unigram-LM (SentencePiece-style hard-EM) tokenizer
  * trainer: segmentations must reassemble the word, match an independent
  * driver-side EM bit-for-bit, and the joint Viterbi likelihood must be
  * non-decreasing across EM rounds (the hard-EM guarantee). */
class UnigramLmSpec extends SparkSpec {
  private val sess = SparkSpec.spark
  import sess.implicits._

  private val MaxPiece = 4
  private val TopV = 40

  /** Driver-side replay: same seed rule, same Viterbi (IEEE products,
    * longer-piece ties), same integer usage -> double probs. */
  private def naiveTrain(vocab: Seq[(String, Long)],
      rounds: Int): (Map[String, Seq[String]], Seq[Map[String, Double]]) = {
    def viterbi(word: String, probs: Map[String, Double]): Seq[String] = {
      val n = word.length
      val dp = Array.fill(n + 1)(-1.0); val back = Array.fill(n + 1)(0)
      dp(0) = 1.0
      for (i <- 1 to n; l <- 1 to math.min(MaxPiece, i)) {
        if (dp(i - l) >= 0.0) probs.get(word.substring(i - l, i)).foreach { p =>
          val s = dp(i - l) * p
          if (s > dp(i) || (s == dp(i) && l > back(i))) { dp(i) = s; back(i) = l }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = n
      while (pos > 0) { out.prepend(word.substring(pos - back(pos), pos)); pos -= back(pos) }
      out.toSeq
    }
    val seedFreq = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, wc) =>
      for (i <- 0 until w.length; l <- 1 to math.min(MaxPiece, w.length - i))
        seedFreq.updateWith(w.substring(i, i + l))(o => Some(o.getOrElse(0L) + wc))
    }
    val multi = seedFreq.toSeq.filter(_._1.length >= 2)
      .sortBy { case (p, f) => (-f, p) }.take(TopV)
    val sel = multi ++ seedFreq.toSeq.filter(_._1.length == 1)
    var probs = {
      val tot = sel.map(_._2).sum.toDouble
      sel.map { case (p, f) => p -> f.toDouble / tot }.toMap
    }
    val probHist = scala.collection.mutable.ArrayBuffer(probs)
    var segs: Map[String, Seq[String]] =
      vocab.map { case (w, _) => w -> viterbi(w, probs) }.toMap
    for (_ <- 1 until rounds) {
      val usage = scala.collection.mutable.Map.empty[String, Long]
      vocab.foreach { case (w, wc) =>
        segs(w).foreach(p => usage.updateWith(p)(o => Some(o.getOrElse(0L) + wc))) }
      val tot = usage.values.sum.toDouble
      probs = usage.map { case (p, u) => p -> u.toDouble / tot }.toMap
      probHist += probs
      segs = vocab.map { case (w, _) => w -> viterbi(w, probs) }.toMap
    }
    (segs, probHist.toSeq)
  }

  private def vocabOf(dir: String): Seq[(String, Long)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextAnalysis.tokensOf(col("text"))).as("word"))
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq

  test("distributed EM equals the driver-side replay bit-for-bit") {
    val vocab = vocabOf(sf).filter(_._1.length <= 12)
    val (naive, _) = naiveTrain(vocab, rounds = 2)
    val got = UnigramLm.train(vocab.toDF("word", "wc"), MaxPiece, TopV, 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(got.keySet == naive.keySet)
    got.foreach { case (w, pieces) =>
      assert(pieces == naive(w), s"word $w: $pieces vs ${naive(w)}")
    }
  }

  test("segmentations reassemble their word; likelihood non-decreasing over rounds") {
    val vocab = vocabOf(sf).filter(_._1.length <= 12)
    val seg = UnigramLm.train(vocab.toDF("word", "wc"), MaxPiece, TopV, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
    seg.foreach { case (w, _, pieces) =>
      assert(pieces.mkString("") == w, s"$w vs $pieces")
      assert(pieces.nonEmpty)
    }
    // hard-EM: corpus Viterbi log-likelihood under (seg_r, p_r) never drops
    val (_, probHist) = naiveTrain(vocab, rounds = 2)
    val (segs1, _) = naiveTrain(vocab, rounds = 1)
    def ll(segs: Map[String, Seq[String]], p: Map[String, Double]): Double =
      vocab.map { case (w, wc) => wc * segs(w).map(x => math.log(p(x))).sum }.sum
    val segs2 = seg.map(s => s._1 -> s._3).toMap
    assert(ll(segs2, probHist(1)) >= ll(segs1, probHist(0)) - 1e-9)
  }

  test("unigram fertility: internally consistent and bounded by word structure") {
    val rows = graft.queries.AnalysisQueries.unigramFertility(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nPieces, nChars) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      val fert = r.getDouble(4); val cpp = r.getDouble(5)
      // at least one piece per word, at most one per character
      assert(nPieces >= nWords && nPieces <= nChars,
        s"${r.getString(0)}: $nWords words, $nPieces pieces, $nChars chars")
      assert(math.abs(fert - nPieces.toDouble / nWords) < 1e-6)
      assert(math.abs(cpp - nChars.toDouble / nPieces) < 1e-6)
      assert(fert >= 1.0 && cpp >= 1.0)
    }
  }
}
