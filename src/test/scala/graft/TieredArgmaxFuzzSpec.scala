package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Exactness fuzz for [[FuzzyJoin.tieredBestMatch]] — the
  * subset-signature argmax that replaces the within-block all-pairs
  * product. The catalog frame only exercises |T| = 2 token sets (every
  * p_name is two colors), where the Jaccard lattice is {1, 1/3, 0};
  * this spec drives the operator with VARIABLE set sizes 1..5 from a
  * tiny vocabulary (dense overlaps, cross-tier claimed-similarity ties,
  * sub/superset pairs — the cases where a wrong within-group head
  * selection or a wrong cross-tier max would show) and asserts exact
  * agreement with a naive all-pairs argmax: same witness, same
  * similarity DOUBLE, same lowest-key tie-break, same (k, k, −1.0)
  * self-fallback for parts alone in their block.
  *
  * Also pins the plan: the signature→heads join must be SHUFFLED hash
  * (heads grow linearly with the corpus — broadcasting them is the
  * n-proportional allocation class that killed rel_edit_pairs at 100×),
  * and the whole plan must stay free of broadcast exchanges and
  * cartesian products. */
class TieredArgmaxFuzzSpec extends SparkSpec {

  /** Naive blocked all-pairs argmax, computed with the same double
    * arithmetic as both engines (int ratio in one division). */
  private def naive(rows: Seq[(String, Long, Seq[String])])
      : Map[Long, (Long, Double)] =
    rows.groupBy(_._1).values.flatMap { blk =>
      blk.map { case (_, k, t0) =>
        val t = t0.toSet
        val best = blk.map { case (_, k2, t2raw) =>
          val t2 = t2raw.toSet
          val sim =
            if (k2 == k) -1.0
            else (t intersect t2).size.toDouble / (t union t2).size.toDouble
          (sim, k2)
        }.maxBy { case (s, k2) => (s, -k2) }
        k -> ((best._2, best._1))
      }
    }.toMap

  private def run(rows: Seq[(String, Long, Seq[String])])
      : Map[Long, (Long, Double)] = {
    val s = spark; import s.implicits._
    val df = rows.toDF("blk", "pk", "toks").repartition(4)
    FuzzyJoin.tieredBestMatch(df, "blk", "pk", "toks")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
  }

  private def check(rows: Seq[(String, Long, Seq[String])], label: String): Unit = {
    val exp = naive(rows)
    val got = run(rows)
    assert(got.keySet == exp.keySet,
      s"$label: parts differ: missing=${(exp.keySet -- got.keySet).take(5)} " +
        s"spurious=${(got.keySet -- exp.keySet).take(5)}")
    val bad = exp.collect {
      case (k, e) if got(k) != e => (k, e, got(k))
    }
    assert(bad.isEmpty, s"$label: ${bad.size} mismatches, first 5: ${bad.take(5)}")
  }

  test("fuzz: variable-size token sets match the naive argmax exactly") {
    val rnd = new scala.util.Random(20260816L)
    val vocab = (0 until 8).map(i => s"t$i")
    val rows = (0 until 300).map { id =>
      val sz = 1 + rnd.nextInt(5)
      val toks = rnd.shuffle(vocab).take(sz)
      (s"b${rnd.nextInt(4)}", id.toLong, toks)
    }
    // the fixture must exercise every interesting tier: identical sets,
    // proper sub/supersets, and at least one part alone in its block
    val withEdges = rows ++ Seq(
      ("b0", 1000L, rows.head._3),                    // identical twin
      ("b1", 1001L, vocab.take(5)), ("b1", 1002L, vocab.take(3)), // subset pair
      ("lonely", 1003L, Seq("t0")))                   // self-fallback
    check(withEdges, "fuzz-variable")
  }

  test("cross-tier tie-breaks and duplicate tokens") {
    // claimed-J ties across tiers: (share 1 of {2,2}) = 1/3 vs
    // (share 2 of {3,3}) = 1/2 vs (share 1 of {1,3}) = 1/3 — equal sims
    // through DIFFERENT tiers must break to the lowest key; duplicate
    // raw tokens must dedup before sizing (|{a,a}| = 1)
    val rows = Seq(
      ("b", 1L, Seq("a", "b")),
      ("b", 2L, Seq("b", "c")),
      ("b", 3L, Seq("c", "d", "e")),
      ("b", 4L, Seq("d", "e", "f")),
      ("b", 5L, Seq("a", "a")),       // dedups to {a}: J(5,1) = 1/2
      ("b", 6L, Seq("f")),
      ("b", 7L, Seq("x", "y", "z")),  // only 0-sim neighbors
      ("solo", 8L, Seq("q")))
    check(rows, "tie-breaks")
  }

  test("catalog entry plan: shuffled-hash heads join, no broadcast, no cartesian") {
    val df = graft.queries.Advanced.fuzzyBestMatchSig(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"heads join must be pinned to shuffled hash:\n$plan")
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
      s"no broadcast allowed (heads grow with the corpus):\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"no pair-product regression:\n$plan")
  }

  test("oversized token sets raise instead of silently losing tiers") {
    val s = spark; import s.implicits._
    val df = Seq(("b", 1L, (0 until 13).map(i => s"t$i"))).toDF("blk", "pk", "toks")
    val e = intercept[Exception] {
      FuzzyJoin.tieredBestMatch(df, "blk", "pk", "toks").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxTokens")), msgs(e).mkString(" | "))
  }
}
