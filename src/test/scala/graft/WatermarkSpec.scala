package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark semantics (SURVEY.md §2.10): append-mode windowed aggregation
  * over a MemoryStream — windows emit only once the watermark passes their
  * end, and data later than the watermark is dropped. The driver-gate
  * streaming queries run complete mode (bounded input); this spec covers
  * the unbounded-input contract the engine claims.
  */
class WatermarkSpec extends SparkSpec {

  test("append mode emits closed windows once; late rows are dropped") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sess.sqlContext

    val in = MemoryStream[(Long, Double)]
    val agg = in.toDF().toDF("sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "60 seconds"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).cast("long").as("total"))
    val name = "graft_watermark_spec"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      // batch 1: rows in window [0,60); max event time 50 -> watermark 40
      in.addData((10L, 1.0), (20L, 2.0), (50L, 3.0))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "window [0,60) emitted before the watermark passed its end")

      // batch 2: event at 130 advances the watermark to 120 > 60, which
      // closes window [0,60) -> it emits exactly once with its 3 rows
      in.addData((130L, 9.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("window.start").cast("long"), col("n"), col("total"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((0L, 3L, 6L)),
        s"expected closed [0,60) emitted once, got ${rows.toSeq}")

      // batch 3: row at 15 is now LATE into the EVICTED window [0,60)
      // (end 60 < watermark 120) -> dropped, no re-emission; the row at
      // 300 closes [120,180)
      in.addData((15L, 100.0), (300L, 1.0))
      q.processAllAvailable()
      val all = spark.table(name)
        .select(col("window.start").cast("long"), col("n"), col("total"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(all == Set((0L, 3L, 6L), (120L, 1L, 9L)),
        s"late row must not resurrect the closed window: $all")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    // the 100 TB-safe variant of stream dedup: plain dropDuplicates
    // keys state FOREVER (unbounded); the within-watermark form evicts
    // keys once the watermark passes them, trading global uniqueness
    // for bounded state. Contract pinned both ways: duplicates inside
    // the watermark window collapse, a duplicate arriving after its
    // key's state was evicted is re-emitted.
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sess.sqlContext

    val in = MemoryStream[(Long, String)]
    val deduped = in.toDF().toDF("sec", "k")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("k")
      .select(col("k"), col("sec"))
    val name = "graft_wm_dedup_spec"
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      // duplicates within the watermark window collapse to first-seen
      in.addData((10L, "a"), (12L, "a"), (15L, "b"))
      q.processAllAvailable()
      val first = spark.table(name).select(col("k"), col("sec"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(first == Set(("a", 10L), ("b", 15L)), s"got $first")

      // advance the watermark far past "a"'s state (10s delay) so the
      // key is evicted...
      in.addData((100L, "c"))
      q.processAllAvailable()
      // ...then the same key again: bounded state means it re-emits
      in.addData((120L, "a"))
      q.processAllAvailable()
      val all = spark.table(name).select(col("k"), col("sec"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(all == Set(("a", 10L), ("b", 15L), ("c", 100L), ("a", 120L)),
        s"evicted key must re-emit (bounded state): $all")
    } finally q.stop()
  }

  test("streaming CUSUM monitors exactly the post-cutoff half against " +
      "frozen calibration params") {
    val out = graft.streaming.StreamingOps
      .cusumMonitor(spark, sf, slack = 0.5, alarm = 5.0).collect()
    assert(out.nonEmpty, "expected monitoring rows")
    // recompute the calendar split independently
    val all = graft.core.Tables.load(spark, sf, "events")
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .distinct().collect().map(_.getString(0)).sorted
    val cutoff = all(math.ceil(all.length / 2.0).toInt - 1)
    val monitored = out.map(_.getAs[String]("day")).distinct.sorted
    assert(monitored.forall(_ > cutoff),
      s"calibration days leaked into monitoring: cutoff $cutoff")
    assert(monitored.toSet == all.filter(_ > cutoff).toSet,
      "every post-cutoff day with events must be monitored")
    // CUSUM statistics are non-negative by construction
    out.foreach { r =>
      assert(r.getAs[Double]("cusum_up") >= 0.0 &&
        r.getAs[Double]("cusum_down") >= 0.0, r.toString)
    }
  }
}
