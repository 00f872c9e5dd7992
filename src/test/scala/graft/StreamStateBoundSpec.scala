package graft

import org.apache.spark.sql.functions._

/** Streaming state-growth measurement (the complement of
  * StreamPlanLintSpec): the lint proves watermark predicates EXIST; this
  * spec proves state actually stays on its bounded model. Every stateful
  * `stream_*` entry is drained at sf0.001 AND sf0.01 and its peak
  * state-store rows (Σ numRowsTotal over operators, max over
  * micro-batches — [[graft.streaming.StreamingOps.lastStateRows]]) are
  * asserted against a model computed FROM THE BATCH TABLES:
  *
  * | entry               | state model (per SF)                        |
  * |---------------------|---------------------------------------------|
  * | stream_window_agg   | == distinct (45 min window, event_type)     |
  * | stream_drift        | == distinct (45 min window, event_type)     |
  * | stream_cusum        | == distinct (1 day window, event_type)      |
  * | stream_ann          | == distinct streamed query ids (≤ NQueries) |
  * | stream_dedup_count  | == distinct (user, type) + distinct type    |
  * | stream_ewma         | == distinct user_id                         |
  * | stream_rate_limit   | ≤ distinct (user, hour window)              |
  * | stream_sessions     | ≤ distinct user_id + 1 (sentinel)           |
  * | stream_join_attrib  | ≤ view rows + click rows (eviction horizon  |
  * |                     |   is the lint's watermark contract)         |
  * | stream_neardup_join | == emitted distinct pairs (dedup state)     |
  *
  * Input rows grow ~10× between the two SFs; each assertion re-derives
  * its model at that SF, so an operator whose state silently tracked
  * INPUT rows (the unbounded-state failure mode) overshoots its model
  * at sf0.01 even if it passed at sf0.001. */
class StreamStateBoundSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def stateOf(name: String): Long = {
    val v = graft.streaming.StreamingOps.lastStateRows.get(name)
    assert(v != null, s"no state recording for $name — drain not run?")
    v
  }

  private def run(entry: String, dir: String): Long = {
    SparkEntry.queries(entry)(spark, dir).collect()
    0L // state read separately by sink name (entries share run plumbing)
  }

  private def events(dir: String) = graft.core.Tables.load(spark, dir, "events")

  test("windowed aggs: state == windows × types present, both SFs") {
    for (dir <- sfs) {
      val w45 = events(dir)
        .select(window(col("ts"), "45 minutes"), col("event_type"))
        .distinct().count()
      val w1d = events(dir)
        .select(window(col("ts"), "1 day"), col("event_type"))
        .distinct().count()

      run("stream_window_agg", dir)
      assert(stateOf("graft_stream_window") == w45,
        s"$dir window agg state != $w45 windows×types")
      run("stream_drift", dir)
      assert(stateOf("graft_stream_drift") == w45,
        s"$dir drift state != $w45 windows×types")
      run("stream_cusum", dir)
      assert(stateOf("graft_stream_cusum") == w1d,
        s"$dir cusum state != $w1d day-windows×types")
    }
  }

  test("keyed state: dedup/ewma/rate-limit/sessions track keys, not input rows") {
    for (dir <- sfs) {
      val ev = events(dir)
      val userType = ev.select(col("user_id"), col("event_type"))
        .distinct().count()
      val types = ev.select(col("event_type")).distinct().count()
      val users = ev.select(col("user_id")).distinct().count()
      val userHour = ev
        .select(col("user_id"), expr("unix_micros(ts) div 1000000 div 3600"))
        .distinct().count()

      run("stream_dedup_count", dir)
      assert(stateOf("graft_stream_dedup") == userType + types,
        s"$dir dedup state != $userType dedup keys + $types agg groups")
      run("stream_ewma", dir)
      assert(stateOf("graft_stream_ewma") == users,
        s"$dir ewma state != $users users")
      run("stream_rate_limit", dir)
      val rl = stateOf("graft_stream_rate_limit")
      assert(rl <= userHour && rl > 0,
        s"$dir rate-limit state $rl outside (0, $userHour user-hours]")
      run("stream_sessions", dir)
      val ss = stateOf("graft_stream_sessions")
      assert(ss <= users + 1 && ss > 0,
        s"$dir sessions state $ss outside (0, ${users + 1} users+sentinel]")
    }
  }

  test("stream-stream join and pair-dedup state stay input-bounded with eviction contracts") {
    for (dir <- sfs) {
      val ev = events(dir)
      val views = ev.filter(col("event_type") === "view").count()
      val clicks = ev.filter(col("event_type") === "click").count()

      run("stream_join_attrib", dir)
      val ja = stateOf("graft_stream_attrib")
      // the exact horizon model is the lint's watermark contract; here
      // the measurement pins "never more than the joinable rows" (a
      // duplicate-buffering regression overshoots this immediately)
      assert(ja <= views + clicks && ja > 0,
        s"$dir attrib join state $ja outside (0, ${views + clicks}]")

      val pairs = SparkEntry.queries("stream_neardup_join")(spark, dir)
      val nPairs = pairs.count()
      assert(stateOf("graft_stream_neardups") == nPairs,
        s"$dir neardup dedup state != $nPairs emitted pairs")
    }
  }

  test("streaming ANN: complete-mode agg state == streamed query count") {
    for (dir <- sfs) {
      val nq = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 10).count() // NQueries = 10
      run("stream_ann", dir)
      assert(stateOf("graft_stream_ann") == nq,
        s"$dir ann state != $nq queries")
    }
  }

  test("rate-limit store sizing probe resolves through the Hadoop FS API") {
    // the probe sizes stream_rate_limit's state-store count from the
    // source's on-disk bytes; it must resolve scheme-qualified paths
    // the way the reader does (a java.io.File probe returned 0 on any
    // non-local scheme and silently re-serialized the stream through
    // the 4-store floor)
    val bare = graft.streaming.StreamingOps.probeBytes(spark, s"$sf/events.parquet")
    assert(bare > 0, "probe returned 0 for an existing local path")
    val qualified = graft.streaming.StreamingOps.probeBytes(
      spark, s"file://$sf/events.parquet")
    assert(qualified == bare,
      s"file:-scheme probe ($qualified) != bare-path probe ($bare)")
    assert(graft.streaming.StreamingOps.probeBytes(
      spark, s"$sf/definitely_missing.parquet") == 0L)
  }
}
