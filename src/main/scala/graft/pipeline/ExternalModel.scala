package graft.pipeline

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Row-wise external-model adapter (SURVEY.md §2.11, §2.10): the engine
  * shape for a map function that crosses an IO boundary (the reference's
  * LLM HTTP call). Everything the reference's async client does —
  * bounded concurrency (base_pipeline.py:27,44), dual token-bucket rate
  * limiting (async_llm_client.py:269-352), retry with capped exponential
  * backoff incl. retry-on-invalid-output (:202-233) — lives INSIDE the
  * partition iterator, so the Spark plan stays a plain projection:
  *
  *   chunks.mapPartitions { batch -> pooledClient.mapAll(batch) }
  *
  * Scale notes: per-partition client reuse (one client per task, not per
  * row); partition count ~ allowed concurrency is the cluster-level
  * analog of the reference's semaphore; Spark task retry is the outer
  * retry layer, the inner loop handles transient API errors without
  * burning a task attempt.
  */
object ExternalModel {

  /** The IO-crossing call: deterministic in tests, HTTP in production. */
  trait Client extends Serializable {
    def call(prompt: String): String
  }

  /** SURVEY §4's partitioning-to-budget rule, realized: the reference
    * gates total in-flight requests with one global semaphore
    * (base_pipeline.py:44); the cluster analog is partitions x
    * per-partition threads = allowed concurrency. Returns the partition
    * count that pins an external-call stage to `maxConcurrent`, bounded
    * below by 1 (never zero) and above by nothing — the BUDGET is the
    * sizing authority, not the core count (an IO-bound stage can healthily
    * run more partitions than cores). */
  def concurrencyPartitions(maxConcurrent: Int, perPartitionParallelism: Int): Int = {
    require(maxConcurrent > 0 && perPartitionParallelism > 0,
      "concurrency budget and per-partition parallelism must be positive")
    math.max(1, math.ceil(
      maxConcurrent.toDouble / perPartitionParallelism).toInt)
  }

  /** Repartition an external-call input to the concurrency budget. */
  def repartitionForBudget[T](ds: Dataset[T], maxConcurrent: Int,
      perPartitionParallelism: Int): Dataset[T] =
    ds.repartition(concurrencyPartitions(maxConcurrent, perPartitionParallelism))

  /** Retry/backoff policy (reference defaults: <=50 retries, 2 s base,
    * 60 s cap — scaled down for engine use). */
  case class RetryPolicy(maxRetries: Int = 5, baseBackoffMs: Long = 10,
      capBackoffMs: Long = 1000)

  /** Token-bucket rate limiter: requests/sec with burst. Thread-safe,
    * one instance per partition (executor-core), so cluster-wide rate =
    * perPartitionRate x partitions — size partitions accordingly, as the
    * reference sizes its semaphore. */
  final class RateLimiter(permitsPerSec: Double, burst: Int) extends Serializable {
    private var tokens: Double = burst.toDouble
    private var lastNs: Long = System.nanoTime()
    def acquire(): Unit = synchronized {
      while (tokens < 1.0) {
        val now = System.nanoTime()
        tokens = math.min(burst.toDouble,
          tokens + (now - lastNs) / 1e9 * permitsPerSec)
        lastNs = now
        if (tokens < 1.0) {
          val waitMs = math.max(1L, ((1.0 - tokens) / permitsPerSec * 1000).toLong)
          Thread.sleep(waitMs)
        }
      }
      tokens -= 1.0
    }
  }

  /** Stats mirrored from the reference's rate/stat counters (A13) via
    * Spark accumulators. */
  case class CallStats(requests: LongAccumulator, retries: LongAccumulator,
      failures: LongAccumulator)

  def newStats(spark: SparkSession, prefix: String): CallStats = CallStats(
    spark.sparkContext.longAccumulator(s"${prefix}_requests"),
    spark.sparkContext.longAccumulator(s"${prefix}_retries"),
    spark.sparkContext.longAccumulator(s"${prefix}_failures"))

  /** Call with retry + backoff; `validate` triggers the reference's
    * retry-on-invalid-JSON behavior. Returns None after exhausting
    * retries (caller fabricates the error row — P9, never throws). */
  def callWithRetry(client: Client, prompt: String, policy: RetryPolicy,
      validate: String => Boolean, stats: Option[CallStats]): Option[String] = {
    var attempt = 0
    while (attempt <= policy.maxRetries) {
      stats.foreach(_.requests.add(1))
      try {
        val out = client.call(prompt)
        if (validate(out)) return Some(out)
      } catch { case _: Exception => }
      attempt += 1
      if (attempt <= policy.maxRetries) {
        stats.foreach(_.retries.add(1))
        val backoff = math.min(policy.capBackoffMs,
          policy.baseBackoffMs * (1L << math.min(attempt, 20)))
        Thread.sleep(backoff)
      }
    }
    stats.foreach(_.failures.add(1))
    None
  }

  /** The map-phase fan-out over an IO client: one client + limiter per
    * partition, rows processed with bounded in-flight concurrency
    * (`parallelism` threads per partition — the asyncio-gather analog). */
  def mapWithClient(spark: SparkSession, prompts: Dataset[(Long, String)],
      mkClient: () => Client, ratePerSec: Double = 1000.0, burst: Int = 100,
      parallelism: Int = 4, policy: RetryPolicy = RetryPolicy(),
      stats: Option[CallStats] = None): DataFrame = {
    import spark.implicits._
    prompts.mapPartitions { it =>
      val client = mkClient() // per-partition connection reuse
      val limiter = new RateLimiter(ratePerSec, burst)
      // a DEDICATED fixed pool of exactly `parallelism` threads bounds
      // in-flight calls per partition (the global EC would let a group of
      // futures exceed the bound and let blocked limiter sleeps starve
      // every other partition's calls in the JVM)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
      val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
      // tie pool lifetime to the TASK, not to iterator exhaustion: a
      // downstream limit/take can abandon the iterator mid-stream, which
      // would leak the pool for the life of the executor
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      val out = it.grouped(parallelism).flatMap { group =>
        val tasks = group.map { case (id, prompt) =>
          scala.concurrent.Future {
            limiter.acquire()
            val res = callWithRetry(client, prompt, policy, _ => true, stats)
            (id, res.getOrElse("Error: external call failed"), res.isEmpty)
          }(ec)
        }
        tasks.map(f => scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration.Inf))
      }
      // belt-and-braces: also shut down on clean drain (local/driver-side
      // use without a TaskContext)
      new Iterator[(Long, String, Boolean)] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) pool.shutdown()
          h
        }
        def next(): (Long, String, Boolean) = out.next()
      }
    }.toDF("id", "response", "is_error")
  }
}
