package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed chunk cache (SURVEY.md S8/S9): the reference's pickle
  * parse-cache keyed by md5(filename, method, chunk params, mtime, size)
  * (document_processing.py:103-189) becomes a parquet dataset per cache
  * key. Hit path = a parquet scan (vectorized, pruned); invalidation = a
  * different key directory.
  *
  * At scale this is the materialized form of "parse each document once
  * though many QAs reference it": chunking 100 TB once and re-reading
  * columnar beats re-exploding text per query.
  */
class ChunkCache(spark: SparkSession, cacheRoot: String) {

  /** Reference-compatible cache key: stable hash of the identifying
    * fields. mtime/size capture source staleness when file-backed. */
  def key(source: String, parser: String, chunkSize: Int, overlap: Int,
      mtime: Long = 0L, size: Long = 0L): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val s = s"$source|$parser|$chunkSize|$overlap|$mtime|$size"
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def dirFor(k: String) = s"$cacheRoot/key=$k"

  def contains(k: String): Boolean =
    Files.exists(Paths.get(dirFor(k), "_SUCCESS"))

  /** Read-through: return cached chunks for the key, else compute via
    * `produce`, persist, and return the cached copy (so downstream always
    * reads the same vectorized parquet either way). */
  def readThrough(k: String)(produce: => DataFrame): DataFrame = {
    if (!contains(k)) {
      produce.write.mode("overwrite").parquet(dirFor(k))
    }
    spark.read.parquet(dirFor(k))
  }

  /** Drop a cache entry (staleness handling beyond key rotation). */
  def invalidate(k: String): Unit = {
    val dir = Paths.get(dirFor(k))
    if (Files.exists(dir)) {
      // Files.walk holds a directory handle — close it or leak one/call
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
  }
}

/** Results sink (SURVEY.md S10): one run directory holding the qa_data
  * rows (json) plus a single-row envelope with configuration echo and
  * run metadata — the reference's results JSON
  * (base_pipeline.py:426-505) split into engine-friendly parts.
  * The clock is injected for deterministic tests. */
object ResultsSink {
  def write(answers: DataFrame, runRoot: String, config: Map[String, String],
      timestampIso: String): String = {
    val spark = answers.sparkSession
    val runDir = s"$runRoot/run_$timestampIso"
    answers.write.mode("overwrite").json(s"$runDir/qa_data")
    val envelope = config.toSeq.sortBy(_._1)
      .foldLeft(spark.range(1).select(lit(timestampIso).as("timestamp"),
        lit(answers.columns.length).as("n_columns"))) {
        case (df, (k, v)) => df.withColumn(s"config_$k", lit(v))
      }
    envelope.coalesce(1).write.mode("overwrite").json(s"$runDir/envelope")
    runDir
  }
}
