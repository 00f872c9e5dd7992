package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Approximate-membership pre-join filtering — the runtime-filter /
  * semi-join-reduction pattern as a USER-facing operator. Spark applies
  * Bloom runtime filters internally (`InjectRuntimeFilter`), but the
  * expressions are not SQL-registered; this exposes the same Catalyst
  * machinery (`BloomFilterAggregate` / `BloomFilterMightContain`) for
  * pipelines that need it explicitly — e.g. decontamination against a
  * benchmark id set too big to broadcast exactly, or pruning a 100 TB
  * fact scan to rows that MIGHT match a filtered dimension.
  *
  * Scale shape: the build side collapses to ONE aggregated row (a few MB
  * of bits for hundreds of millions of keys at ~1% fp) that broadcasts;
  * the probe side evaluates a hash test per row — no shuffle, no join,
  * and the false-positive slack is resolved by whatever exact operation
  * follows. No false negatives, ever: every true match passes. */
object BloomJoin {

  /** Aggregate `keys` (LONG column) into a Bloom filter binary. */
  def bloomAgg(keys: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(keys.cast("long")),
      Bridge.expression(lit(expectedItems)),
      Bridge.expression(lit(numBits))).toAggregateExpression())

  /** Membership probe against an aggregated Bloom binary. */
  def mightContain(bloom: Column, key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(bloom),
      Bridge.expression(key.cast("long"))))

  /** Filter `probe` to rows whose `probeKey` might be in `build`'s
    * `buildKey` set. The aggregated Bloom binary (one row, a few MB even
    * for 10^8 keys) round-trips through the driver and enters the probe
    * plan as a constant — `might_contain` requires a constant/scalar-
    * subquery filter, and this is exactly how Spark's own
    * InjectRuntimeFilter ships it. The probe side stays scan+filter. */
  def filterMaybeIn(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    val bits = build.agg(
      bloomAgg(col(buildKey), expectedItems, numBits).as("__bloom"))
      .collect()(0).getAs[Array[Byte]](0)
    probe.filter(mightContain(lit(bits), col(probeKey)))
  }
}
