package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JVM-static injection state: local-mode tasks run in this JVM, so a
  * top-level object (reached via the static MODULE$ reference, never
  * serialized into the closure) is visible to both the task and the
  * asserting test thread. `armed` guarantees each tag fires EXACTLY
  * once — the first attempt-0 task to evaluate it dies, its retry (and
  * every other task) passes. */
object RetrySpec {
  private val armed = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  val injections = new java.util.concurrent.atomic.AtomicInteger(0)

  def poke(tag: String): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0
        && armed.putIfAbsent(tag, java.lang.Boolean.TRUE) == null) {
      injections.incrementAndGet()
      throw new RuntimeException(s"graft RetrySpec injected failure: $tag")
    }
  }
}

/** Fold determinism under REAL task re-execution. Every hash gate in
  * the catalog rides on the ordered folds (`ordered_sum` and the
  * two/three-level block trees built from it) producing bit-identical
  * doubles no matter which task ATTEMPT computed a partial: a retried
  * task re-reads its input (for a reduce task, shuffle blocks possibly
  * in a different fetch order) and must fold the same values in the
  * same order. That was by-construction (collect-then-sort) but never
  * exercised — these tests kill one task attempt per run (the shared
  * test master is `local[4, 2]`, so Spark retries instead of failing
  * the job) and assert the retried run's doubles are BITWISE equal to
  * the clean run's, across the three fold families: the two-level
  * block fold, blockedMoments' d² cells, the vocab-style three-level
  * hash-bucket tree, and the graph rank fold. */
class RetrySpec extends SparkSpec {
  import RetrySpec.poke

  /** Identity passthrough that kills the first attempt-0 task of the
    * stage it evaluates in. The LONG form gates an upstream filter
    * (map-side stage); the DOUBLE form wraps an aggregate output
    * (reduce-side stage — a projection on the agg VALUE cannot be
    * pushed below the Aggregate, unlike a predicate on group keys). */
  private def pokeLong(tag: String) = udf { (x: Long) => poke(tag); x }
  private def pokeDouble(tag: String) = udf { (x: Double) => poke(tag); x }

  private def bitsOf(df: DataFrame, keyCols: Seq[String],
      valCol: String): Map[String, Long] =
    df.collect().map { r =>
      keyCols.map(c => r.get(r.fieldIndex(c)).toString).mkString("|") ->
        java.lang.Double.doubleToLongBits(r.getDouble(r.fieldIndex(valCol)))
    }.toMap

  /** Runs `injected` expecting exactly one task kill, asserts the kill
    * actually happened (a test that never exercised a retry must not
    * pass silently), and bit-compares against `clean`. */
  private def assertRetryEqual(clean: DataFrame, injected: => DataFrame,
      keyCols: Seq[String], valCol: String): Unit = {
    // `injected` is by-name: operators with an eager driver-side action
    // in their builder (pageRank's |V| count) must construct AFTER the
    // counter snapshot or the injection fires before `before` is read
    val before = RetrySpec.injections.get()
    val got = bitsOf(injected, keyCols, valCol)
    assert(RetrySpec.injections.get() == before + 1,
      "injected failure never fired — the retry path was not exercised")
    val want = bitsOf(clean, keyCols, valCol)
    assert(got == want, "retried run diverged bitwise from clean run")
  }

  private val tfn = graft.functions.TextFunctions

  // 20k rows, 100 groups, ~40 blocks per group — order-sensitive values
  // (1/(id+1) spans magnitudes, so a different fold order flips low bits)
  private def base: DataFrame =
    spark.range(20000).select(col("id"),
      (col("id") % 100).as("g"),
      expr("id div 512").as("blk"),
      (lit(1.0) / (col("id") + lit(1)).cast("double")).as("v"))

  private def twoLevelFold(df: DataFrame): DataFrame =
    df.groupBy(col("g"), col("blk"))
      .agg(tfn.ordered_sum(col("v"), col("id")).as("s"))
      .groupBy(col("g"))
      .agg(tfn.ordered_sum(col("s"), col("blk")).as("s"))

  test("two-level ordered fold is bitwise stable under a map-side task retry") {
    val injected = twoLevelFold(
      base.filter(pokeLong("fold-map")(col("id")) >= 0))
    assertRetryEqual(twoLevelFold(base), injected, Seq("g"), "s")
  }

  test("two-level ordered fold is bitwise stable under a reduce-side task retry") {
    // the poke wraps the FINAL fold output, so the killed task is a
    // post-shuffle reduce task that re-fetches its shuffle blocks
    val injected = twoLevelFold(base)
      .select(col("g"), pokeDouble("fold-reduce")(col("s")).as("s"))
    assertRetryEqual(twoLevelFold(base), injected, Seq("g"), "s")
  }

  private def emb: DataFrame =
    spark.range(1000).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 7), j -> cast(sin(vec_id * 8 + j) as float))")
        .as("embedding"))

  test("blockedMoments d² cells are bitwise stable under task retry") {
    val clean = graft.operators.Similarity.blockedMoments(emb, 256L)
      .toDF("blk", "i", "j", "s")
    val injected = graft.operators.Similarity.blockedMoments(
        emb.filter(pokeLong("moments-map")(col("vec_id")) >= 0), 256L)
      .toDF("blk", "i", "j", "s")
    assertRetryEqual(clean, injected, Seq("blk", "i", "j"), "s")
  }

  // the vocab-fold shape (AnalysisQueries' three-level xxh64 bucket
  // tree): term order within fine bucket, fine within coarse, coarse
  // across — on synthetic terms so the failure can be injected upstream
  private def vocabTree(df: DataFrame): DataFrame =
    df.withColumn("fine", tfn.hash64(col("term"))
        .bitwiseAND(lit(0xFFFFL)))
      .groupBy(col("fine"))
      .agg(tfn.ordered_sum(col("v"), col("term")).as("bt"))
      .groupBy(expr("fine div 256").as("coarse"))
      .agg(tfn.ordered_sum(col("bt"), col("fine")).as("bt"))
      .agg(round(tfn.ordered_sum(col("bt"), col("coarse")), 9).as("mi"))
      .select(lit(0L).as("k"), col("mi"))

  test("three-level vocab bucket tree is bitwise stable under task retry") {
    val terms = spark.range(5000).select(col("id"),
      concat(lit("term_"), col("id")).as("term"),
      (lit(1.0) / (col("id") + lit(3)).cast("double")).as("v"))
    val injected = vocabTree(
      terms.filter(pokeLong("vocab-map")(col("id")) >= 0)
        .drop("id"))
    assertRetryEqual(vocabTree(terms.drop("id")), injected, Seq("k"), "mi")
  }

  test("graph rank fold is bitwise stable under task retry") {
    val pairs = spark.range(400).select(
        (col("id") % 50).as("pa"), ((col("id") * 7 + 3) % 50).as("pb"))
      .filter(col("pa") < col("pb")).distinct()
    val clean = graft.operators.Graph.pageRank(pairs, 3)
    assertRetryEqual(clean,
      graft.operators.Graph.pageRank(
        pairs.filter(pokeLong("rank-map")(col("pa")) >= 0), 3),
      Seq("node"), "rank_norm")
  }

  /** The streaming state path under a REAL task retry: batch folds are
    * retry-proven above, but the stream entries' hash gates ride
    * mapGroupsWithState updates whose exactly-once story is the state
    * store's attempt transactionality (an uncommitted attempt's store
    * updates must be aborted, the retry must reload the last committed
    * version and fold the SAME rows in the SAME order). The poke rides
    * a .map fused into the stateful stage, so the killed attempt dies
    * AFTER its group fold ran — the worst case for a leaky store. Two
    * micro-batches, so batch-1 state carries across the retried
    * batch-0 task. */
  test("streaming mapGroupsWithState output is identical under a state-task retry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark; import s.implicits._
    val chunk1 = Seq(
      (1L, 1L, 1L, 10.0), (1L, 2L, 2L, 12.0), (1L, 3L, 3L, 11.0),
      (1L, 4L, 4L, 10.5), (2L, 1L, 5L, 5.0), (2L, 2L, 6L, 5.0))
    val chunk2 = Seq(
      (1L, 5L, 7L, 11.5), (1L, 6L, 8L, 500.0), (1L, 7L, 9L, 10.0),
      (2L, 3L, 10L, 5.0))
    def run(tag: Option[String]): Map[Long, (Long, Long, Long, Long)] = {
      val in = MemoryStream[(Long, Long, Long, Double)]
      val out = graft.streaming.EwmaState.ewma(in.toDS())
      val staged = tag match {
        case Some(t) => out.map { r => poke(t); r }
        case None => out
      }
      val name = s"graft_retry_stream_${System.nanoTime()}"
      val q = staged.toDF().writeStream
        .outputMode("update").format("memory").queryName(name).start()
      try {
        in.addData(chunk1: _*); q.processAllAvailable()
        in.addData(chunk2: _*); q.processAllAvailable()
      } finally q.stop()
      // update mode appends one row per touched user per batch; the
      // final state per user is the bit-compared payload
      spark.table(name).groupBy($"user_id")
        .agg(max(struct($"n_events", $"ewma", $"ewmad", $"n_anomalies")).as("st"))
        .collect().map { r =>
          val st = r.getStruct(1)
          r.getLong(0) -> ((st.getLong(0),
            java.lang.Double.doubleToLongBits(st.getDouble(1)),
            java.lang.Double.doubleToLongBits(st.getDouble(2)),
            st.getLong(3)))
        }.toMap
    }
    val clean = run(None)
    val before = RetrySpec.injections.get()
    val injected = run(Some("stream-ewma"))
    assert(RetrySpec.injections.get() == before + 1,
      "injected failure never fired — the streaming retry path was not exercised")
    assert(injected == clean,
      s"retried stream diverged from clean run: $injected vs $clean")
  }
}
