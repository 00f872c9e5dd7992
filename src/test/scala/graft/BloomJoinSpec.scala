package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {

  test("bloom prefilter: no false negatives, real pruning, bounded fp rate") {
    val cust = graft.core.Tables.load(spark, sf, "customer")
      .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val keys = cust.collect().map(_.getLong(0)).toSet
    assert(keys.nonEmpty)
    val maybe = BloomJoin.filterMaybeIn(orders, "o_custkey", cust, "c_custkey",
        expectedItems = 100000L, numBits = 1600000L)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every true match passes (the property that makes the exact
    // follow-up join's result invariant under the prefilter)
    val trueMatches = orders.select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => keys.contains(p._2))
    val maybeSet = maybe.toSet
    trueMatches.foreach(p => assert(maybeSet.contains(p), s"false negative: $p"))
    // and the filter actually prunes: false positives are a sliver at
    // these sizings (1.6M bits for ~100 keys)
    val total = orders.count()
    val fp = maybe.length - trueMatches.length
    assert(fp >= 0)
    assert(maybe.length < total / 2,
      s"no pruning: ${maybe.length} of $total passed")
  }
}
