package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Size-capped LRU store behind [[DfCache]] — instantiable so the spec
  * can exercise eviction under a tiny cap (the production cap never
  * evicts within a bench/verify lifetime: ~10 tags vs 32 slots).
  *
  * Locking discipline: the frame is BUILT OUTSIDE the lock (a builder
  * that reads another cache entry — clusters -> pairs — must not hold
  * it, and a long Spark job must not serialize other lookups), then
  * inserted under a short synchronized block; an insert race loser
  * releases its orphaned blocks, same as the old putIfAbsent scheme.
  * Eviction unpersists the eldest entry's checkpoint blocks — an
  * evicted localCheckpointed frame is NOT reusable (its lineage was
  * truncated at materialization), which is the right contract for a
  * cache: consumers read through [[cached]] every time and a
  * re-request rebuilds. */
private[graft] class DfCacheStore(maxEntries: Int) {
  private val cache = new java.util.LinkedHashMap[
      (SparkSession, String, String), DataFrame](16, 0.75f, /*access order*/ true) {
    // eviction is manual (in cached()) so the evicted frame can be
    // unpersisted — removeEldestEntry can't return the victim
  }

  /** Builds (several derived bases) run at most once per
    * (session, dir, tag) while the entry stays resident.
    *
    * @param checkpoint set false when the builder already returns a
    *                   checkpointed frame (it manages its own transient
    *                   persist lifecycle) — avoids a second
    *                   materialization pass. */
  def cached(spark: SparkSession, dir: String, tag: String,
      checkpoint: Boolean = true)(f: => DataFrame): DataFrame = {
    val key = (spark, dir, tag)
    cache.synchronized {
      val existing = cache.get(key) // get() refreshes LRU recency
      if (existing != null) return existing
    }
    val built = if (checkpoint) f.localCheckpoint(true) else f
    cache.synchronized {
      val prev = cache.get(key)
      if (prev != null) {
        // double-compute race loser: release the orphaned blocks
        releaseBlocks(built)
        prev
      } else {
        cache.put(key, built)
        while (cache.size() > maxEntries) {
          val it = cache.entrySet().iterator()
          val eldest = it.next()
          it.remove()
          releaseBlocks(eldest.getValue)
        }
        built
      }
    }
  }

  /** Releases a frame's storage. `Dataset.unpersist` only knows
    * `persist()`-registered plans — a localCheckpointed frame is a
    * `LogicalRDD` the CacheManager never saw, so its checkpoint blocks
    * must be unpersisted at the RDD layer or the release frees NOTHING
    * (blocks would linger until ContextCleaner GC, unbounded growth
    * under dir churn — the exact scenario the LRU exists for). Shared
    * by every transient-checkpoint site (e.g. ivfProbeCurve), not just
    * this cache. Only call on frames whose LogicalRDDs the caller
    * exclusively owns: the collect releases EVERY checkpoint in the
    * plan, so a frame derived from a still-shared checkpointed base
    * must not be passed here. */
  private[graft] def releaseBlocks(df: DataFrame): Unit = {
    df.unpersist(blocking = false) // covers persist()-built frames
    checkpointRdds(df).foreach(_.unpersist(blocking = false))
  }

  private[graft] def checkpointRdds(
      df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }

  private[graft] def entryCount: Int = cache.synchronized(cache.size())
}

/** Shared per-(session, dir, tag) DataFrame cache for derived bases
  * that several catalog entries would otherwise recompute identically
  * (graph pair tables, near-dup cluster tables, k-means assignments,
  * trained model scores, the sparse-retrieval tf explode).
  * `localCheckpoint(true)` materializes each base once and breaks
  * lineage, so consumers plan against values, not the derivation; each
  * module keeps its PRIMARY catalog entry uncached so the real
  * derivation keeps an honest standalone bench timing — only the
  * downstream consumers read through this cache.
  *
  * Entries are LRU-evicted (blocks unpersisted) beyond 32 — inert for
  * bench/verify lifetimes (~10 tags), real for a long-lived service
  * where dirs churn. DfCacheSpec pins the eviction behavior. */
object DfCache extends DfCacheStore(32)
