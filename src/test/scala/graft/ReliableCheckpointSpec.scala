package graft

import org.apache.spark.sql.functions._
import graft.core.Checkpoints

/** Pins the two checkpoint postures behind [[Checkpoints.stable]]: the
  * local[n] default (executor-local blocks, no config) and the cluster
  * form (`spark.graft.checkpointDir` → reliable checkpoint files under
  * the configured root, which survive executor loss). Both must return
  * the same rows, and the reliable route must actually WRITE — a
  * silently-local "reliable" checkpoint would reintroduce the exact
  * fault-tolerance gap the conf exists to close. */
class ReliableCheckpointSpec extends SparkSpec {

  /** Restores sc.checkpointDir = None. `setCheckpointDir(null)` maps
    * through Option(null) in SparkContext, so it unsets; the reflection
    * fallback covers a future Spark that null-checks first. */
  private def clearScCheckpointDir(): Unit = {
    val sc = spark.sparkContext
    try sc.setCheckpointDir(null)
    catch { case _: Throwable => () }
    if (sc.getCheckpointDir.nonEmpty) {
      val m = sc.getClass.getMethods
        .find(_.getName == "checkpointDir_$eq")
        .getOrElse(fail("cannot reset SparkContext.checkpointDir"))
      m.invoke(sc, None)
    }
    assert(sc.getCheckpointDir.isEmpty)
  }

  private def df = spark.range(500).select(col("id"),
    (lit(1.0) / (col("id") + lit(1)).cast("double")).as("v"))

  test("stable() defaults to executor-local checkpoint when no root is set") {
    assume(spark.conf.getOption(Checkpoints.DirKey).isEmpty)
    val before = spark.sparkContext.getCheckpointDir
    assume(before.isEmpty)
    val out = Checkpoints.stable(df)
    assert(out.count() == 500)
    // no root got installed as a side effect
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }

  test("stable() writes a reliable checkpoint under the configured root, same rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val localRows = Checkpoints.stable(df).collect()
      .map(r => (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1))))
      .sortBy(_._1)
    spark.conf.set(Checkpoints.DirKey, root)
    try {
      val rel = Checkpoints.stable(df)
      val relRows = rel.collect()
        .map(r => (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1))))
        .sortBy(_._1)
      assert(relRows.sameElements(localRows))
      // the root was installed and checkpoint FILES exist under it
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(
        new java.io.File(root).getName)))
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      val nFiles =
        try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally walk.close()
      assert(nFiles > 0, "reliable checkpoint wrote no files under the root")
    } finally {
      spark.conf.unset(Checkpoints.DirKey)
      clearScCheckpointDir()
    }
  }

  test("a catalog entry is posture-invariant: labelOutliers hash-matches across flavors") {
    val localRows = graft.queries.SimilarityQueries.labelOutliers(spark, sf)
      .collect().map(_.toString).sorted
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-q").toString
    spark.conf.set(Checkpoints.DirKey, root)
    try {
      val relRows = graft.queries.SimilarityQueries.labelOutliers(spark, sf)
        .collect().map(_.toString).sorted
      assert(relRows.sameElements(localRows))
    } finally {
      spark.conf.unset(Checkpoints.DirKey)
      clearScCheckpointDir()
    }
  }
}
