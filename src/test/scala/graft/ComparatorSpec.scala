package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextKernels
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level pins for the cross-implementation comparators
  * ([[graft.functions.DamerauLevenshtein]], [[graft.functions
  * .HammingBytes]]). The catalog oracles (`adv_damerau_best_match`,
  * `adv_hamming_pairs`) gate the kernels against DuckDB's OWN builtins
  * on real data; this spec pins the semantics those gates rely on:
  * probed DuckDB values (byte domain, TRUE unrestricted DL — not OSA),
  * metric axioms, and a fuzz against an independent exponential-search
  * reference implementation. */
class ComparatorSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    TextKernels.damerauLevenshtein(
      UTF8String.fromString(a), UTF8String.fromString(b))
  private def ham(a: String, b: String): Int =
    TextKernels.hammingBytes(
      UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent reference: branch-and-bound search over edit scripts
    * (match / substitute / insert / delete / adjacent-block transpose
    * with inner gap cost — the Lowrance-Wagner move set), memoized on
    * (i, j). Deliberately NOT the production DP recurrence. */
  private def dlRef(a: Array[Byte], b: Array[Byte]): Int = {
    val memo = collection.mutable.Map.empty[(Int, Int), Int]
    def go(i: Int, j: Int): Int = memo.getOrElseUpdate((i, j), {
      if (i == a.length) b.length - j
      else if (j == b.length) a.length - i
      else {
        var best = go(i + 1, j + 1) + (if (a(i) == b(j)) 0 else 1)
        best = math.min(best, go(i + 1, j) + 1) // delete a(i)
        best = math.min(best, go(i, j + 1) + 1) // insert b(j)
        // transpose: a(i) matches some b(j'), a(i') matches b(j) with
        // i' > i, j' > j; the characters between are deleted/inserted
        var i2 = i + 1
        while (i2 < a.length) {
          if (a(i2) == b(j)) {
            var j2 = j + 1
            while (j2 < b.length) {
              if (a(i) == b(j2)) {
                val cost = 1 + (i2 - i - 1) + (j2 - j - 1) + go(i2 + 1, j2 + 1)
                best = math.min(best, cost)
              }
              j2 += 1
            }
          }
          i2 += 1
        }
        best
      }
    })
    go(0, 0)
  }

  private def forAll[A](gen: Gen[A], n: Int)(body: A => Unit): Unit = {
    var seed = Seed(912L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  test("damerau-levenshtein matches the probed DuckDB builtin values") {
    // probed against duckdb damerau_levenshtein 2026-08-15 (see the
    // adv_damerau_best_match oracle): TRUE DL, byte domain
    assert(dl("CA", "ABC") == 2)   // OSA would say 3
    assert(dl("ca", "abc") == 2)
    assert(dl("ab", "ba") == 1)
    assert(dl("abcdef", "abcfed") == 2)
    assert(dl("spark", "sprak") == 1)
    assert(dl("", "abc") == 3)
    assert(dl("Ünïcode", "Unicode") == 4) // per-BYTE, not per-char
    assert(dl("北京", "京北") == 6)
    assert(dl("", "") == 0)
    assert(dl("same", "same") == 0)
  }

  test("hamming matches the probed DuckDB builtin values") {
    assert(ham("karolin", "kathrin") == 3)
    assert(ham("北京a", "京北a") == 6) // byte domain
    assert(ham("", "") == 0)
    assert(ham("abc", "abcd") == -1) // engine: -1 where DuckDB raises
  }

  test("damerau-levenshtein fuzz: agrees with an independent reference and is a metric") {
    val sGen = Gen.choose(0, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    forAll(Gen.zip(sGen, sGen, sGen), 300) { case (a, b, c) =>
      val ab = dl(a, b)
      assert(ab == dlRef(a.getBytes("UTF-8"), b.getBytes("UTF-8")),
        s"dl($a, $b)")
      assert(ab == dl(b, a), s"symmetry dl($a, $b)")
      assert(ab <= dl(a, c) + dl(c, b), s"triangle dl($a,$b) via $c")
      assert((ab == 0) == (a == b))
    }
  }

  private def jac(a: String, b: String): Double =
    TextKernels.jaccardBytes(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("byte-set jaccard matches probed DuckDB values and a set-based reference") {
    // probed: set not multiset; bytes not chars; case-sensitive
    assert(jac("abc", "abd") == 0.5)
    assert(jac("aab", "ab") == 1.0)
    assert(jac("abc", "cba") == 1.0)
    assert(jac("ab", "AB") == 0.0)
    assert(math.abs(jac("Üß", "Ü") - 2.0 / 3) < 1e-15)
    assert(jac("", "") == 1.0) // engine extension; DuckDB raises there
    assert(jac("", "a") == 0.0)
    val sGen = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    forAll(Gen.zip(sGen, sGen), 300) { case (a, b) =>
      val sa = a.getBytes("UTF-8").toSet; val sb = b.getBytes("UTF-8").toSet
      val expect = if ((sa ++ sb).isEmpty) 1.0
        else sa.intersect(sb).size.toDouble / (sa ++ sb).size
      assert(jac(a, b) == expect, s"jac($a, $b)")
    }
  }

  test("hamming fuzz: equals positionwise mismatch count on equal-length strings") {
    val sGen = Gen.choose(0, 12).flatMap(n =>
      Gen.zip(Gen.listOfN(n, Gen.alphaNumChar), Gen.listOfN(n, Gen.alphaNumChar)))
    forAll(sGen, 300) { case (xs, ys) =>
      val a = xs.mkString; val b = ys.mkString
      assert(ham(a, b) == a.zip(b).count { case (x, y) => x != y })
    }
  }
}
