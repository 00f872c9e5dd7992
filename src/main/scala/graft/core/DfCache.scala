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
  * releases its orphaned blocks immediately (nobody else ever saw that
  * frame, so the release is provably safe).
  *
  * Eviction is DEFERRED, not immediate: `cached()` hands out the frame
  * reference, so an immediate unpersist could yank checkpoint blocks
  * out from under a consumer that looked the frame up moments earlier
  * (or retained it in a long-lived service — the very scenario the LRU
  * exists for); a localCheckpointed frame has truncated lineage, so
  * missing blocks fail the job rather than recompute. Instead the
  * victim's checkpoint RDDs go onto a pending list keyed by a weak
  * reference to the frame's analyzed plan root: every Dataset derived
  * from the cached frame holds that plan node (Dataset ops wrap the
  * parent's analyzed plan), so the reference clears only when NO
  * consumer can still run the frame — then the sweep (piggybacked on
  * every subsequent insert, or explicit via [[sweepReleases]])
  * unpersists the blocks at the RDD layer. Until then the blocks stay
  * pinned: bounded by construction (one entry per eviction, swept on
  * every lookup AND insert — a service whose tag set stabilizes still
  * drains on hits), and inert for bench/verify lifetimes.
  *
  * Consumer contract: the deferral guarantee anchors on the frame's
  * ANALYZED PLAN, which every derived Dataset retains — so hold the
  * DataFrame (or a Dataset derived from it) for as long as you may
  * execute it. A consumer that keeps only a derived `df.rdd` or a
  * `toLocalIterator` cursor WITHOUT the Dataset does not reach the
  * anchor, and a GC can release the checkpoint blocks under it. */
private[graft] class DfCacheStore(maxEntries: Int) {
  private val cache = new java.util.LinkedHashMap[
      (SparkSession, String, String), DataFrame](16, 0.75f, /*access order*/ true) {
    // eviction is manual (in cached()) so the victim can be routed to
    // the deferred-release list — removeEldestEntry can't return it
  }

  /** An evicted entry awaiting release: `anchor` weakly tracks the
    * frame's analyzed plan root (reachable while ANY consumer Dataset
    * derived from the frame is alive); `rdds` strongly pins the
    * checkpoint RDDs so we can still unpersist them after the plan is
    * gone (an RDD holds no back-reference to the plan, so pinning it
    * never keeps the anchor alive). */
  private final class Pending(
      val anchor: java.lang.ref.WeakReference[AnyRef],
      val rdds: Seq[org.apache.spark.rdd.RDD[_]])
  private val pending = new scala.collection.mutable.ArrayBuffer[Pending]

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
      // lookups drain the pending-release list too (not just inserts):
      // a long-lived service whose tag set stabilizes never inserts
      // again, which would otherwise pin evicted blocks forever
      sweepLocked()
      val existing = cache.get(key) // get() refreshes LRU recency
      if (existing != null) return existing
    }
    val built = if (checkpoint) Checkpoints.stable(f) else f
    cache.synchronized {
      sweepLocked()
      val prev = cache.get(key)
      if (prev != null) {
        // double-compute race loser: nobody but this thread ever saw
        // the orphan, so its blocks can be released immediately
        releaseBlocks(built)
        prev
      } else {
        cache.put(key, built)
        while (cache.size() > maxEntries) {
          val it = cache.entrySet().iterator()
          val eldest = it.next()
          it.remove()
          deferRelease(eldest.getValue)
        }
        built
      }
    }
  }

  /** Queues an evicted frame's checkpoint blocks for release once no
    * consumer can still execute the frame. `unpersist` on the frame
    * itself runs immediately — it only covers persist()-built plans,
    * where dropping the CacheManager entry is safe (lineage is intact;
    * a live consumer recomputes instead of failing). */
  private def deferRelease(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    val rdds = checkpointRdds(df)
    if (rdds.nonEmpty) {
      pending += new Pending(
        new java.lang.ref.WeakReference[AnyRef](df.queryExecution.analyzed), rdds)
    }
  }

  private def sweepLocked(): Int = {
    var released = 0
    var i = 0
    while (i < pending.length) {
      if (pending(i).anchor.get() == null) {
        pending(i).rdds.foreach(_.unpersist(blocking = false))
        pending.remove(i)
        released += 1
      } else i += 1
    }
    released
  }

  /** Releases every pending eviction whose last consumer reference has
    * been collected; returns how many were released. Runs implicitly on
    * each insert — exposed for tests and for an explicit service-side
    * maintenance hook. */
  private[graft] def sweepReleases(): Int = cache.synchronized(sweepLocked())

  /** Evicts EVERY entry through the deferred-release discipline — the
    * bench's isolated-rerun protocol hook (cold-cache reps: an isolated
    * minimum must include the one-time base build a standalone run
    * pays, or the committed series silently mixes warm-rerun and
    * cold-batch numbers). Safe for straggling consumers: deferral keeps
    * blocks pinned until no derived Dataset can still execute. */
  private[graft] def clearAll(): Unit = cache.synchronized {
    val it = cache.entrySet().iterator()
    while (it.hasNext) { deferRelease(it.next().getValue); it.remove() }
    sweepLocked()
  }

  /** Timer-driven idle sweep: lookup- and insert-piggybacked sweeps
    * cover every ACTIVE workload, but a long-lived service whose tag
    * set stabilizes AND then goes idle gets no further cache traffic —
    * evicted blocks whose consumers have been GC'd would stay pinned
    * until the next request. A daemon timer drains the deferred-release
    * list on a fixed cadence regardless of traffic. Caller owns the
    * returned timer (cancel() on shutdown); the task holds only this
    * store. */
  private[graft] def startSweeper(periodMs: Long): java.util.Timer = {
    val t = new java.util.Timer("graft-dfcache-sweep", /*daemon*/ true)
    t.schedule(new java.util.TimerTask {
      override def run(): Unit = sweepReleases()
    }, periodMs, periodMs)
    t
  }

  // Reference-counted SHARED sweeper: every QaService instance sweeps
  // the same global store, so per-instance timers are pure redundancy
  // (instances created without close() would each leave a daemon
  // thread behind). One timer serves all acquirers; the last release
  // cancels it.
  private[this] var sharedSweeper: java.util.Timer = null
  private[this] var sweeperRefs = 0

  /** Acquires the shared idle sweeper (starting it on first acquire);
    * pair with [[releaseSweeper]]. The period is fixed by the first
    * acquirer until refs drain to zero. */
  private[graft] def acquireSweeper(periodMs: Long): Unit = synchronized {
    if (sweeperRefs == 0) sharedSweeper = startSweeper(periodMs)
    sweeperRefs += 1
  }

  /** Releases one reference on the shared sweeper, cancelling the timer
    * when the last reference drains. Extra releases are no-ops. */
  private[graft] def releaseSweeper(): Unit = synchronized {
    if (sweeperRefs > 0) {
      sweeperRefs -= 1
      if (sweeperRefs == 0) { sharedSweeper.cancel(); sharedSweeper = null }
    }
  }

  private[graft] def sweeperRefCount: Int = synchronized(sweeperRefs)

  private[graft] def pendingReleaseCount: Int =
    cache.synchronized(pending.length)

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
  * [[Checkpoints.stable]] materializes each base once and breaks
  * lineage, so consumers plan against values, not the derivation; each
  * module keeps its PRIMARY catalog entry uncached so the real
  * derivation keeps an honest standalone bench timing — only the
  * downstream consumers read through this cache.
  *
  * Entries are LRU-evicted beyond 32 — inert for bench/verify
  * lifetimes (~10 tags), real for a long-lived service where dirs
  * churn. Eviction defers the block release until no consumer still
  * holds the frame (weak-ref on the plan root), so a lookup racing an
  * eviction can never observe a lineage-truncated frame with missing
  * blocks. DfCacheSpec pins both the eviction and the deferral. */
object DfCache extends DfCacheStore(32)
