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

  test("restarted ewma query resumes from checkpointed mapGroupsWithState state") {
    val sess = spark
    import sess.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ewma_ckpt")
      .toString
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    // (user_id, n_events, ewma) per update emission — the memory sink
    // doesn't support checkpoint recovery, so collect via foreachBatch
    // (the dedup restart test's pattern)
    val states = new ConcurrentLinkedQueue[(Long, Long, Double)]()

    def writeBatch(rows: Seq[(Long, Long, Long, Double)]): Unit =
      rows.toDF("user_id", "us", "event_id", "value").coalesce(1)
        .write.mode(SaveMode.Append).parquet(srcDir)

    def runOnce(): Unit = {
      val typed = spark.readStream
        .schema("user_id LONG, us LONG, event_id LONG, value DOUBLE")
        .parquet(srcDir)
        .as[(Long, Long, Long, Double)]
      val q = graft.streaming.EwmaState.ewma(typed).toDF().writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            states.add((r.getLong(0), r.getLong(1), r.getDouble(2))))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: 3 events for user 1, then STOP (simulated executor loss)
    writeBatch(Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 12.0),
      (1L, 3L, 3L, 11.0)))
    runOnce()
    // run 2, same checkpoint: 2 more events — the restored state must
    // continue the decayed accumulator, NOT restart from i=0
    writeBatch(Seq((1L, 4L, 4L, 11.5), (1L, 5L, 5L, 10.5)))
    runOnce()

    val last = states.toArray.map(_.asInstanceOf[(Long, Long, Double)])
      .filter(_._1 == 1L).maxBy(_._2)
    // replay the full 5-event stream in order
    var (ewma, i) = (0.0, 0L)
    Seq(10.0, 12.0, 11.0, 11.5, 10.5).foreach { x =>
      ewma = if (i == 0L) x else 0.2 * x + 0.8 * ewma; i += 1
    }
    val want = BigDecimal(ewma)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(last._2 == 5L, s"state lost across restart: $last")
    assert(last._3 == want, s"ewma diverged: ${last._3} vs $want")
  }
}
