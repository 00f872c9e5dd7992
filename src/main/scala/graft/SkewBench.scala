package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-join measurement harness — the companion of [[ScaleUp]]'s
  * `zipf` mode. The key-offset frame is uniform by construction, so
  * the salting entries (`adv_salted_agg`/`adv_salted_join`) and the
  * AQE-skew claims were semantics-only until this: on a genuinely
  * skewed frame (30% of orders on one hot customer per copy) it times
  * the SAME orders ⋈ customer aggregation three ways and proves the
  * results identical:
  *
  *   1. `direct`    — shuffle hash join, AQE off: the straggler
  *                    baseline (every hot-key row through one task);
  *   2. `aqe_skew`  — AQE on with skew-join splitting: Spark's own
  *                    runtime mitigation, zero code change;
  *   3. `salted`    — AQE off, manual two-path hot-key salting: hot
  *                    keys (found by a count pass, driver-bounded at
  *                    rows/threshold keys) fan out over `Salt`
  *                    buckets with the dimension replicated ONLY for
  *                    those keys; cold keys join untouched. The
  *                    portable mitigation when the engine lacks AQE
  *                    or the skew is known ahead of time.
  *
  * Auto-broadcast is disabled throughout: at 10×-frame scale the
  * dimension still fits in memory, but the 100 TB posture this
  * measures is the shuffled-join one — broadcasting would measure a
  * different (trivially skew-immune) plan.
  *
  * Prints one JSON line:
  * `{"metric":"skew_join","direct":s,"aqe_skew":s,"salted":s,
  *   "agg_direct":s,"agg_salted":s,"rows":n,"hot_keys":k}`.
  * The agg pair times groupBy(o_custkey) sum/count direct vs
  * two-phase salted — expected to tie (partial aggregation already
  * collapses hot group keys map-side); measured to document THAT,
  * not to win.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<skewFrame> runMain graft.SkewBench`. */
object SkewBench {

  private val Salt = 32
  // a key is "hot" at ~1000x the uniform expectation (~10 orders per
  // customer); the zipf frame's hot keys carry ~45k orders per copy
  private val HotThreshold = 10000L

  private def segAgg(joined: DataFrame): DataFrame =
    joined.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"))

  /** Two-path hot-key salting: fact rows on hot keys get a salt from
    * their own PK, the dimension replicates Salt× for hot keys only,
    * cold rows join unchanged — identical output, no straggler. */
  private def saltedJoin(orders: DataFrame, cust: DataFrame): DataFrame = {
    val hotKeys = orders.groupBy(col("o_custkey")).count()
      .filter(col("count") > HotThreshold)
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSeq
    require(hotKeys.nonEmpty, "skew frame has no hot keys — wrong input?")
    val isHotO = col("o_custkey").isin(hotKeys: _*)
    val hot = orders.filter(isHotO)
      .withColumn("salt", pmod(col("o_orderkey"), lit(Salt)).cast("int"))
    val dimHot = cust.filter(col("c_custkey").isin(hotKeys: _*))
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    val hotJoined = hot.join(dimHot,
      hot("o_custkey") === dimHot("c_custkey") && hot("salt") === dimHot("salt"))
    val coldJoined = orders.filter(!isHotO)
      .join(cust, col("o_custkey") === col("c_custkey"))
    segAgg(hotJoined.select(col("c_mktsegment"), col("o_totalprice"))
      .unionByName(coldJoined.select(col("c_mktsegment"), col("o_totalprice"))))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val cust = core.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))

    def aqe(on: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
    }
    def timed(f: => DataFrame): (Double, Seq[(String, Long, java.math.BigDecimal)]) = {
      val t0 = System.nanoTime()
      val rows = f.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2))).sortBy(_._1).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // warm the reader/codegen once so variant 1 isn't charged setup
    orders.count(); cust.count()

    aqe(on = false)
    val (tDirect, rDirect) = timed(
      segAgg(orders.join(cust, col("o_custkey") === col("c_custkey"))))
    aqe(on = true)
    val (tAqe, rAqe) = timed(
      segAgg(orders.join(cust, col("o_custkey") === col("c_custkey"))))
    aqe(on = false)
    val (tSalted, rSalted) = timed(saltedJoin(orders, cust))
    require(rDirect == rAqe && rDirect == rSalted,
      s"variants disagree:\n$rDirect\n$rAqe\n$rSalted")

    // agg pair: direct groupBy on the skewed key vs two-phase salted —
    // partial aggregation already collapses hot keys map-side, so the
    // expectation is a tie; measured to document it
    def aggCollect(df: DataFrame): Long =
      df.agg(count(lit(1))).head().getLong(0)
    val (tAggDirect, nAggDirect) = {
      val t0 = System.nanoTime()
      val n = aggCollect(orders.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("s")))
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (tAggSalted, nAggSalted) = {
      val t0 = System.nanoTime()
      val n = aggCollect(orders
        .withColumn("salt", pmod(col("o_orderkey"), lit(Salt)))
        .groupBy(col("o_custkey"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("ps"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s")))
      ((System.nanoTime() - t0) / 1e9, n)
    }
    require(nAggDirect == nAggSalted, "agg variants disagree on group count")

    val nHot = orders.groupBy(col("o_custkey")).count()
      .filter(col("count") > HotThreshold).count()
    println(f"""{"metric":"skew_join","direct":$tDirect%.2f,""" +
      f""""aqe_skew":$tAqe%.2f,"salted":$tSalted%.2f,""" +
      f""""agg_direct":$tAggDirect%.2f,"agg_salted":$tAggSalted%.2f,""" +
      s""""rows":${rDirect.map(_._2).sum},"hot_keys":$nHot,"sf":"$sfDir"}""")
    spark.stop()
  }
}
