package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared per-(session, dir, tag) DataFrame cache for derived bases
  * that several catalog entries would otherwise recompute identically
  * (graph pair tables, near-dup cluster tables, k-means assignments,
  * trained model scores). One home for the concurrency-sensitive idiom:
  *
  *  - `localCheckpoint(true)` materializes the base once and breaks
  *    lineage, so consumers plan against values, not the derivation;
  *  - `putIfAbsent`, NOT `computeIfAbsent`: a builder that touches the
  *    same map (clusters -> pairs) would throw
  *    IllegalStateException("Recursive update") whenever the two keys
  *    share a bin — a JVM-layout-dependent some-runs-only failure
  *    (observed once in a full-bench run). Building outside the map
  *    leaves only a benign double-compute race, which the sequential
  *    bench/verify paths never exercise;
  *  - each module keeps its PRIMARY catalog entry uncached so the real
  *    derivation keeps an honest standalone bench timing — only the
  *    downstream consumers read through this cache.
  *
  * Entries live for the session (the bench/verify lifetime); a
  * long-lived service would add eviction here — one place, not six. */
object DfCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** @param checkpoint set false when the builder already returns a
    *                   checkpointed frame (it manages its own transient
    *                   persist lifecycle) — avoids a second
    *                   materialization pass. */
  def cached(spark: SparkSession, dir: String, tag: String,
      checkpoint: Boolean = true)(f: => DataFrame): DataFrame = {
    val key = (spark, dir, tag)
    val existing = cache.get(key)
    if (existing != null) existing
    else {
      val built = if (checkpoint) f.localCheckpoint(true) else f
      val prev = cache.putIfAbsent(key, built)
      if (prev != null) {
        // double-compute race loser: release the orphaned blocks
        built.unpersist(blocking = false)
        prev
      } else built
    }
  }
}
