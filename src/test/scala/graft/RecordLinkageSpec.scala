package graft

import org.apache.spark.sql.functions._

/** Behavioral contract of the Fellegi-Sunter linkage
  * ([[graft.queries.Advanced.recordLinkage]]) beyond the oracle's value
  * equality: decision consistency, weight monotonicity, and the
  * corruption model showing up where it should. */
class RecordLinkageSpec extends SparkSpec {

  private lazy val rows = graft.queries.Advanced.recordLinkage(spark, sf)
    .collect()
    .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) ->
      (r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    .toMap

  test("decision is the weight's sign; full agreement is matched and " +
      "almost entirely true matches") {
    rows.foreach { case (pat, (_, _, weight, matched)) =>
      assert(matched == (weight > 0), s"$pat: matched=$matched weight=$weight")
    }
    val (nPairs, nTrue, w, matched) = rows((true, true, true))
    assert(matched, "full agreement must classify as a match")
    assert(nTrue.toDouble / nPairs > 0.9,
      s"full-agreement pattern should be dominated by true matches " +
        s"($nTrue/$nPairs)")
    assert(w == rows.values.map(_._3).max,
      "full agreement must carry the maximum weight")
  }

  test("weights are monotone in agreement: flipping any field to " +
      "disagree lowers the pattern weight") {
    def w(p: (Boolean, Boolean, Boolean)) = rows.get(p).map(_._3)
    for {
      a <- Seq(true, false); b <- Seq(true, false); c <- Seq(true, false)
      (flip, base) <- Seq(
        ((false, b, c), (true, b, c)),
        ((a, false, c), (a, true, c)),
        ((a, b, false), (a, b, true)))
      lo <- w(flip); hi <- w(base)
    } assert(lo < hi, s"$flip ($lo) must weigh less than $base ($hi)")
  }

  test("the corruption model leaves most non-matches unmatched and most " +
      "true pairs found (precision/recall both meaningful)") {
    val all = rows.values
    val nTrue = all.map(_._2).sum
    val tp = all.filter(_._4).map(_._2).sum
    val predicted = all.filter(_._4).map(_._1).sum
    assert(nTrue > 0 && predicted > 0)
    assert(tp.toDouble / nTrue > 0.8, s"recall ${tp.toDouble / nTrue}")
    // chance agreements make precision < 1 but blocking + weights keep
    // the candidate flood out
    assert(tp.toDouble / predicted > 0.5,
      s"precision ${tp.toDouble / predicted}")
  }
}
