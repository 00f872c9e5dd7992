package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval (band / range) join — with [[AsOfJoin]], the second
  * time-join operator Spark has no native form of (the brief's canonical
  * "operator Spark lacks" pair). Semantics: all pairs (l, r) sharing
  * `key` with `r.ts ∈ [l.ts + lo, l.ts + hi]` (inclusive band, e.g.
  * "views by this user in the hour before the purchase").
  *
  * A naive formulation (`l JOIN r ON key equal AND r.ts BETWEEN ...`)
  * gives Catalyst only an equi-key plus a theta predicate: fine when one
  * side broadcasts, but at scale it degenerates to per-key quadratic
  * work. The binned formulation makes the band an EQUI-join key:
  *
  *  - bin width w = hi - lo (the band length), in event-time units;
  *  - a right row lives in bin floor(ts / w);
  *  - a left row's band [ts+lo, ts+hi] spans at most TWO consecutive
  *    bins — it emits those (<= 2x row expansion, independent of data);
  *  - equi-join on (key, bin), then the exact band predicate filters.
  *
  * Every true match surfaces in EXACTLY one joined row (the bin that
  * contains r.ts), so no dedup pass is needed. Shuffle volume is
  * O(2|L| + |R|) rows keyed by (key, bin) — hash-partitioned, AQE-skew-
  * splittable, no broadcast or nested loop anywhere. */
object RangeJoin {

  /** @param left   probe side (each row may match many right rows)
    * @param right  side providing the banded matches
    * @param key    equality key present in both inputs
    * @param ts     timestamp column name present in both inputs
    * @param loSec  band start offset vs left.ts, in seconds (may be < 0)
    * @param hiSec  band end offset vs left.ts, in seconds; must be > loSec
    * @param rightPrefix prefix applied to right's non-key output columns
    * @return inner-join rows: left columns + prefixed right columns */
  def binned(left: DataFrame, right: DataFrame, key: String, ts: String,
      loSec: Long, hiSec: Long, rightPrefix: String = "r_"): DataFrame = {
    require(hiSec > loSec, s"empty band: [$loSec, $hiSec]")
    val w = (hiSec - loSec) * 1000000L
    val lo = loSec * 1000000L
    val hi = hiSec * 1000000L
    // integer `div` (not double floor) so left and right derive bins from
    // the same arithmetic — no boundary drift at large epoch magnitudes
    val l = left
      .withColumn("__lt", unix_micros(col(ts)))
      .withColumn("__bin", explode(array_distinct(array(
        expr(s"(__lt + ${lo}L) div ${w}L"),
        expr(s"(__lt + ${hi}L) div ${w}L")))))
    val rCols = right.columns.map(c =>
      if (c == key) col(c) else col(c).as(s"$rightPrefix$c"))
    val r = right.select(rCols.toSeq: _*)
      .withColumn("__rt", unix_micros(col(s"$rightPrefix$ts")))
      .withColumn("__bin", expr(s"__rt div ${w}L"))
    l.join(r, Seq(key, "__bin"))
      .filter(col("__rt") >= col("__lt") + lo &&
        col("__rt") <= col("__lt") + hi)
      .drop("__bin", "__lt", "__rt")
  }
}
