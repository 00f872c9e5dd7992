package graft.core

import org.apache.spark.sql.DataFrame

/** The engine's single lineage-truncation point. Every query that
  * materializes an intermediate (to break a self-referencing plan, to
  * stop a triple lineage replay, to snapshot a streaming sink) goes
  * through [[stable]], which picks the checkpoint flavor from session
  * state:
  *
  *   - `spark.graft.checkpointDir` set (or an explicit
  *     `sc.setCheckpointDir`) → **reliable** `Dataset.checkpoint(true)`:
  *     blocks are written to that root (HDFS/S3/local path), so an
  *     executor loss recomputes nothing and fails nothing — the
  *     cluster-deployment form.
  *   - otherwise → `localCheckpoint(true)`: blocks live in executor
  *     storage (memory, spilling to executor-local disk). Fast and
  *     right for single-JVM `local[n]` runs — but NOT fault-tolerant:
  *     on a real cluster an executor loss fails the query instead of
  *     recomputing, because the truncated lineage has nothing to
  *     recompute FROM. A cluster deployment must set the checkpoint
  *     root.
  *
  * Both forms return a `LogicalRDD`-backed frame, so
  * [[DfCache.releaseBlocks]]' RDD-layer unpersist applies to either
  * (reliable checkpoint FILES outlive unpersist by design; reclaim via
  * `spark.cleaner.referenceTracking.cleanCheckpoints` or dir hygiene).
  *
  * ReliableCheckpointSpec pins both routes: same rows either way, and
  * the reliable route actually writes under the configured root. */
object Checkpoints {

  /** Session conf key for the reliable checkpoint root. Read per call
    * (cheap string lookup) so a service can flip posture at runtime. */
  val DirKey = "spark.graft.checkpointDir"

  /** Eagerly materializes `df` and truncates its lineage — reliable
    * checkpoint when a root is configured, executor-local otherwise. */
  def stable(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val confDir = spark.conf.getOption(DirKey).filter(_.nonEmpty)
    if (confDir.isEmpty && sc.getCheckpointDir.isEmpty)
      df.localCheckpoint(true)
    else {
      // an explicit sc.setCheckpointDir wins; otherwise install the
      // configured root once (setCheckpointDir creates a unique
      // per-app subdir, so concurrent apps sharing the root don't
      // collide)
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(confDir.get)
      else confDir.foreach { d =>
        // the sc-level dir is SparkContext-global and set-once; a second
        // SparkSession on the shared context with a DIFFERENT configured
        // root silently checkpoints under the first session's dir — make
        // the mismatch visible instead of silent
        if (!sc.getCheckpointDir.exists(_.startsWith(d)))
          System.err.println(s"[graft] Checkpoints.stable: session conf " +
            s"$DirKey=$d but the shared SparkContext already checkpoints " +
            s"under ${sc.getCheckpointDir.get} (context-global, set-once); " +
            "blocks for this session go under the existing root")
      }
      df.checkpoint(true)
    }
  }

  /** Chained-call sugar: `df.select(...).stableCheckpoint()` reads like
    * the `localCheckpoint(true)` it replaces. */
  implicit class StableOps(private val df: DataFrame) extends AnyVal {
    def stableCheckpoint(): DataFrame = stable(df)
  }
}
