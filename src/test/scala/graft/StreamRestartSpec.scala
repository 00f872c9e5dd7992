package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Checkpoint-restart contract: a stopped streaming query restarted from
  * its checkpoint resumes with RESTORED state — previously-seen keys
  * stay deduplicated and already-processed files are not replayed. This
  * is the fault-tolerance half of §2.10 (the rate-limit/watermark specs
  * cover the semantics half): on a real cluster every executor loss or
  * deploy rolls through exactly this path. */
class StreamRestartSpec extends SparkSpec {

  test("restarted query resumes from checkpointed dedup state") {
    val sess = spark
    import sess.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    val seen = new ConcurrentLinkedQueue[Long]()

    def writeBatch(users: Seq[Long]): Unit =
      users.toDF("user_id").coalesce(1).write.mode(SaveMode.Append)
        .parquet(srcDir)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("user_id LONG")
        .parquet(srcDir)
        .dropDuplicates("user_id")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    writeBatch(Seq(1L, 2L, 2L))
    runOnce()
    assert(seen.toArray.toSet == Set(1L, 2L), seen.toString)

    // second run, same checkpoint: user 2 must stay deduplicated by the
    // RESTORED state store, and the first file must not be replayed
    writeBatch(Seq(2L, 3L))
    runOnce()
    val all = seen.toArray.map(_.asInstanceOf[Long]).toSeq
    assert(all.toSet == Set(1L, 2L, 3L), s"state lost across restart: $all")
    assert(all.size == 3, s"replay detected (duplicate emissions): $all")
  }
}
