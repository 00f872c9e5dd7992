package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Tokenizer

/** Text-analysis operators for training-data pipelines: quality scoring,
  * language-ID heuristic, document fingerprinting. All pure column
  * expressions (codegen'd, shuffle-free, oracle-checkable). */
object TextAnalysis {

  def tokensOf(text: Column): Column =
    regexp_extract_all(text, lit(Tokenizer.DuckDbTokenRegex), lit(0))

  /** English stopword sample used by the quality score / lang-ID. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Quality features + composite score in [0,1]:
    * length score (tokens/500 capped), stopword ratio, punctuation ratio
    * (inverted), mean token length window. Mirrors the usual doc-quality
    * heuristics (length/punct/stopword ratios). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokensOf(text)
    val n = size(toks).cast("double")
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
    val nPunct = size(filter(toks, t => t.rlike("^[^\\p{L}\\p{N}]$"))).cast("double")
    val meanLen = when(n > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n)
      .otherwise(lit(0.0))
    val lengthScore = least(n / 500.0, lit(1.0))
    val stopRatio = when(n > 0, nStop / n).otherwise(lit(0.0))
    val punctRatio = when(n > 0, nPunct / n).otherwise(lit(0.0))
    val meanLenScore = when(meanLen.between(3.0, 8.0), lit(1.0)).otherwise(lit(0.5))
    val quality = round(
      lengthScore * 0.3 + stopRatio * 10.0 * 0.3 + (lit(1.0) - punctRatio) * 0.2
        + meanLenScore * 0.2, 4)
    Seq(
      "n_tokens" -> size(toks),
      "stopword_ratio" -> round(stopRatio, 4),
      "punct_ratio" -> round(punctRatio, 4),
      "mean_token_len" -> round(meanLen, 4),
      "quality" -> least(quality, lit(1.0)))
  }

  /** Marker-word language ID: per-language marker lists, predicted language
    * = argmax marker hits (ties -> lexicographically first), 'und' if no
    * marker hits at all. A classic n-gram/profile heuristic reduced to
    * word-profiles (deterministic & oracle-checkable). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def predictedLang(text: Column): Column = {
    val toks = tokensOf(text)
    val scores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      struct(size(filter(toks, t => array_contains(m, t))).as("hits"),
        lit(lang).as("lang"))
    }
    // argmax by hits, tie -> smallest lang string: sort desc by (hits, -lang)
    // array_sort ascending on struct; take last for max hits; for equal hits
    // we want the lexicographically FIRST lang, so invert: sort by (hits asc,
    // lang desc) then take last => (max hits, min lang).
    val best = element_at(array_sort(array(scores.map(s =>
      struct(s("hits").as("hits"), s("lang").as("lang"))): _*),
      (l, r) => when(l("hits") < r("hits"), -1)
        .when(l("hits") > r("hits"), 1)
        .when(l("lang") > r("lang"), -1)
        .when(l("lang") < r("lang"), 1)
        .otherwise(0)), -1)
    when(best("hits") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Rolling polynomial fingerprint over the first `take` tokens:
    * tokens -> numeric contributions (codepoint of first char + 7*length),
    * then h = fold (h*31 + x) mod 1e9+7. Two explicit steps (map, fold) so
    * the DuckDB oracle (list_transform + list_reduce) is shape-identical. */
  def fingerprint(text: Column, take: Int): Column = {
    val nums = transform(slice(tokensOf(text), 1, take),
      t => (ascii(t) + length(t) * 7).cast("long"))
    aggregate(nums, lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(1000000007L)))
  }
}
