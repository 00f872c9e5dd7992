package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.ExternalModel
import graft.pipeline.ExternalModel.{Client, RetryPolicy}

class ExternalModelSpec extends SparkSpec {

  test("mapWithClient processes all rows with per-partition clients") {
    val sess = spark
    import sess.implicits._
    val prompts = (1L to 100L).map(i => (i, s"prompt $i")).toDS.repartition(4)
    val out = ExternalModel.mapWithClient(spark, prompts,
      () => new Client { def call(p: String): String = s"echo:$p" },
      parallelism = 2).collect()
    assert(out.length == 100)
    assert(out.forall(r => r.getAs[String]("response") ==
      s"echo:prompt ${r.getAs[Long]("id")}"))
    assert(out.forall(!_.getAs[Boolean]("is_error")))
  }

  test("early-terminated consumer does not leak the per-partition pool") {
    val sess = spark
    import sess.implicits._
    def poolThreads(): Int = {
      import scala.jdk.CollectionConverters._
      Thread.getAllStackTraces.keySet.asScala
        .count(t => t.getName.startsWith("pool-") && t.isAlive)
    }
    val before = poolThreads()
    val prompts = (1L to 100L).map(i => (i, s"p$i")).toDS.repartition(2)
    // limit(1) abandons the partition iterators mid-stream: the pools must
    // be shut down by the task-completion listener, not iterator drain
    val out = ExternalModel.mapWithClient(spark, prompts,
      () => new Client { def call(p: String): String = p },
      parallelism = 3).limit(1).collect()
    assert(out.length == 1)
    // completion listeners run at task end; give threads a moment to die
    val deadline = System.nanoTime() + 5000000000L
    var now = poolThreads()
    while (now > before && System.nanoTime() < deadline) {
      Thread.sleep(100); now = poolThreads()
    }
    // slack 1 absorbs unrelated default-named executors spawning mid-test;
    // a real leak adds `parallelism` (3) threads per partition
    assert(now <= before + 1, s"leaked pool threads: $before -> $now")
  }

  test("retry recovers transient failures; exhaustion yields error row") {
    object FlakyOnce extends Client {
      private val counts = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
      def call(p: String): String = {
        val n = counts.computeIfAbsent(p, _ => new AtomicInteger()).incrementAndGet()
        if (n < 3) throw new RuntimeException("transient")
        s"ok:$p"
      }
    }
    val got = ExternalModel.callWithRetry(FlakyOnce, "q", RetryPolicy(maxRetries = 5),
      _ => true, None)
    assert(got.contains("ok:q"))

    object AlwaysFails extends Client {
      def call(p: String): String = throw new RuntimeException("down")
    }
    val none = ExternalModel.callWithRetry(AlwaysFails, "q",
      RetryPolicy(maxRetries = 2, baseBackoffMs = 1), _ => true, None)
    assert(none.isEmpty)
  }

  test("retry-on-invalid-output (the reference's JSON-retry)") {
    object BadThenGood extends Client {
      private val n = new AtomicInteger()
      def call(p: String): String =
        if (n.incrementAndGet() < 3) "not json" else """{"a":1}"""
    }
    val got = ExternalModel.callWithRetry(BadThenGood, "q",
      RetryPolicy(maxRetries = 5, baseBackoffMs = 1),
      out => graft.functions.LenientJsonExtract.extract(out) != null, None)
    assert(got.contains("""{"a":1}"""))
  }

  test("concurrency budget pins the stage partitioning") {
    import graft.pipeline.ExternalModel
    assert(ExternalModel.concurrencyPartitions(1000, 8) == 125)
    assert(ExternalModel.concurrencyPartitions(10, 8) == 2)
    assert(ExternalModel.concurrencyPartitions(3, 8) == 1)
    intercept[IllegalArgumentException](ExternalModel.concurrencyPartitions(0, 8))
    val sess = spark
    import sess.implicits._
    val ds = (1 to 100).map(i => (i.toLong, s"p$i")).toDS()
    val pinned = ExternalModel.repartitionForBudget(ds, 24, 4)
    assert(pinned.rdd.getNumPartitions == 6)
  }

  test("rate limiter bounds throughput") {
    val rl = new ExternalModel.RateLimiter(permitsPerSec = 100, burst = 5)
    val t0 = System.nanoTime()
    (1 to 25).foreach(_ => rl.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 25 permits at 100/s with burst 5: needs >= ~180ms of refill
    assert(elapsedMs >= 150, s"rate limiter too permissive: $elapsedMs ms")
  }
}
