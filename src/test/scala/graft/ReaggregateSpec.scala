package graft

import org.apache.spark.sql.functions._

/** Sketch reaggregation — the 100 TB dashboard pattern: materialize a
  * small mergeable summary per fine-grained cell (day), answer coarser
  * questions (week, total) by MERGING summaries instead of rescanning
  * raw data. Datasketches HLL union at equal lgK is lossless over the
  * sketch state, so the merged estimate must EQUAL the direct estimate
  * over the raw stream — that equality (not just an error bound) is the
  * contract pinned here, plus the usual accuracy bound vs exact. */
class ReaggregateSpec extends SparkSpec {

  test("daily HLL sketches merged == direct sketch; estimate near exact") {
    // events must go through Tables.load (INT64 TIMESTAMP(NANOS) parquet)
    val ev = graft.core.Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))

    // fine-grained summaries: one 12-bit HLL sketch per day
    val daily = ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))

    // coarse answer by MERGE (never rescans events)
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("est"))
      .collect()(0).getLong(0)

    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est"))
      .collect()(0).getLong(0)

    val exact = ev.select(col("user_id")).distinct().count()

    assert(merged == direct,
      s"lossless merge violated: merged=$merged direct=$direct")
    // 12-bit HLL relative standard error ~= 1.04 / sqrt(2^12) ~= 1.6%;
    // allow 5 sigma
    assert(math.abs(merged - exact).toDouble / exact < 0.08,
      s"estimate $merged too far from exact $exact")
  }
}
