package graft

import org.apache.spark.sql.functions._

/** Probability contract of the Kneser-Ney bigram model
  * ([[graft.queries.AnalysisQueries.kneserNeyModel]]) on a hand-sized
  * corpus where every statistic is checkable by arithmetic:
  *
  *   docs: "san fran", "san the", "a the", "b the", "c d"
  *   bigrams (each once): san→fran, san→the, a→the, b→the, c→d
  *   ctx(san)=2, N1+(san·)=2; N1+(·fran)=1, N1+(·the)=3,
  *   N1+(·d)=1, N1+(··)=5, D=0.75
  */
class KneserNeySpec extends SparkSpec {

  private def model() = {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "san fran"), (1L, "san the"), (2L, "a the"),
      (3L, "b the"), (4L, "c d")).toDF("doc_id", "text")
    val btf = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.bigram_counts(col("text")))
        .as(Seq("bg", "tf")))
    graft.queries.AnalysisQueries.kneserNeyModel(btf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("every observed bigram gets positive probability; per-context " +
      "observed mass stays under 1 (unseen mass is strictly positive)") {
    val m = model()
    assert(m.size == 5, s"expected 5 observed bigrams, got ${m.keySet}")
    m.foreach { case (bg, p) =>
      assert(p > 0.0 && p <= 1.0, s"$bg: p=$p out of (0,1]")
    }
    val sanMass = m("san fran") + m("san the")
    // d never follows san, so the continuation backoff reserves mass:
    // 0.25/2 + 0.25/2 + 0.75*(2/2)*((1+3)/5) = 0.85
    assert(math.abs(sanMass - 0.85) < 1e-12, s"sum over ctx san = $sanMass")
    assert(sanMass < 1.0 - 1e-9,
      "observed-continuation mass must leave room for unseen continuations")
  }

  test("continuation counts, not frequency, drive the backoff: equal-count " +
      "bigrams rank by how many contexts the word completes") {
    val m = model()
    // both appear once after 'san' (same discount, same ctx): 'the'
    // completes 3 contexts, 'fran' only 1 — the de-boilerplate
    // property (exact: 0.575 vs 0.275)
    assert(math.abs(m("san the") - 0.575) < 1e-12, m.toString)
    assert(math.abs(m("san fran") - 0.275) < 1e-12, m.toString)
    assert(m("san the") > m("san fran"))
  }
}
