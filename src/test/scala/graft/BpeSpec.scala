package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Contracts for BPE merge induction: greedy overlap semantics and the
  * deterministic tie-break — the two places where an implementation can
  * silently diverge from the reference algorithm. */
class BpeSpec extends SparkSpec {

  private def wordsDf(rows: (String, Long)*) =
    spark.createDataFrame(rows.map { case (w, f) => Tuple2(w, f) })
      .toDF("word", "f")

  test("mergePair is the greedy left-to-right scan (no re-merge of overlaps)") {
    val df = spark.createDataFrame(Seq(
      Tuple1("aaa"), Tuple1("aaaa"), Tuple1("aab"), Tuple1("baa"),
      Tuple1("b"))).toDF("w")
      .select(col("w"), Bpe.mergePair(split(col("w"), ""), "a", "a").as("m"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("aaa") == Seq("aa", "a"))
    assert(got("aaaa") == Seq("aa", "aa"))
    assert(got("aab") == Seq("aa", "b"))
    assert(got("baa") == Seq("b", "aa"))
    assert(got("b") == Seq("b"))
  }

  test("equal pair counts break lexicographically on (a, b)") {
    // (c,d) and (a,b) both occur twice; the rule must pick (a,b)
    val rules = Bpe.mergeRules(spark, wordsDf("cd" -> 2L, "ab" -> 2L), k = 1)
      .collect()
    assert(rules.toSeq == Seq(Row(1, "a", "b", 2L)))
  }

  test("overlapping occurrences all count, then merge greedily across rounds") {
    // 'aaaa' x3: round 1 sees pair (a,a) at 3 positions x f=3 = 9,
    // merges to [aa, aa]; round 2 then learns (aa, aa) with count 3
    val rules = Bpe.mergeRules(spark, wordsDf("aaaa" -> 3L), k = 2).collect()
    assert(rules.toSeq == Seq(Row(1, "a", "a", 9L), Row(2, "aa", "aa", 3L)))
  }

  test("frequency weighting picks the heavier pair") {
    val rules = Bpe.mergeRules(spark,
      wordsDf("xy" -> 10L, "zw" -> 3L, "zz" -> 4L), k = 1).collect()
    assert(rules.toSeq == Seq(Row(1, "x", "y", 10L)))
  }

  /** Reference implementation of the greedy left-to-right merge scan. */
  private def naiveMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("property: mergePair equals the naive scan on random small-alphabet words") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small alphabet maximizes overlapping-run coverage ("aaaa" shapes)
    val word = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
      .map(_.mkString)
    val pair = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c"))
    val words = (0 until 300).flatMap(i =>
      Gen.zip(word, pair).apply(Gen.Parameters.default, Seed(i.toLong)))
    val grouped = words.groupBy(_._2).toSeq
    for (((a, b), ws) <- grouped) {
      val df = spark.createDataFrame(ws.map(w => Tuple1(w._1)).distinct)
        .toDF("w")
        .select(col("w"), Bpe.mergePair(split(col("w"), ""), a, b).as("m"))
      df.collect().foreach { r =>
        val w = r.getString(0)
        assert(r.getSeq[String](1) == naiveMerge(w.map(_.toString), a, b),
          s"word=$w pair=($a,$b)")
      }
    }
  }
}
