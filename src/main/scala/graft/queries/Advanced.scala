package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.operators.FuzzyJoin
import graft.streaming.StreamingOps

/** Advanced coverage: multi-level aggregation (grouping sets / rollup —
  * the one-pass collapse of the reference's A2+A3+A4 family, SURVEY.md
  * §2.7 note), judge meta-evaluation P/R/F1 (A10), the fuzzy similarity
  * join (J3/P10/P11/O4), and Structured Streaming (§2.10) run as a real
  * streaming query with a batch oracle.
  */
object Advanced extends graft.QueryModule {

  /** A2+A3+A4 one-pass: rollup over (returnflag, linestatus) — per-pair,
    * per-flag, and grand-total rows in one aggregation pass. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        grouping_id().cast("long").as("gid"))

  /** A10: per-class precision/recall/F1 of the lang-ID heuristic against
    * the labeled lang column — TP/FP/FN from one confusion pass. */
  def langidPrf(spark: SparkSession, dir: String): DataFrame = {
    val pred = AnalysisQueries.langid(spark, dir)
      .select(col("lang"), col("predicted"))
    val perTrue = pred.groupBy(col("lang"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("predicted") === col("lang"), 1).otherwise(0)).as("tp"))
    val perPred = pred.groupBy(col("predicted").as("lang"))
      .agg(count(lit(1)).as("predicted_n"))
    perTrue.join(perPred, Seq("lang"), "left_outer")
      .withColumn("predicted_n", coalesce(col("predicted_n"), lit(0L)))
      .withColumn("precision",
        round(when(col("predicted_n") > 0,
          col("tp") / col("predicted_n")).otherwise(lit(0.0)), 4))
      .withColumn("recall", round(col("tp") / col("support"), 4))
      .withColumn("f1", round(
        when(col("tp") > 0,
          lit(2.0) * (col("tp") / col("predicted_n")) * (col("tp") / col("support"))
            / (col("tp") / col("predicted_n") + col("tp") / col("support")))
          .otherwise(lit(0.0)), 4))
      .select(col("lang"), col("support"), col("tp"), col("predicted_n"),
        col("precision"), col("recall"), col("f1"))
  }

  /** J3/O4: fuzzy best-match self-join on part names — token-set Jaccard
    * within a (p_type, p_size) block, arg-max per part (ties -> lowest
    * key). The compound blocking key is the scale lever (the reference
    * blocks on shared year the same way): block sizes stay bounded, so
    * pairwise similarity inside each block is cheap at any corpus size
    * (p_type alone: 80M pairs / 200 s at sf0.1; with p_size: ~2 s). */
  def fuzzyBestMatch(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .withColumn("blk", concat_ws("|", col("p_type"), col("p_size")))
    // probe side spread across cores: the blocked pair expansion (~70x
    // fan-out) happens on the probe side of the broadcast join, and the
    // single-row-group scan would otherwise pin it to one task
    val a = Tables.loadSpread(spark, dir, "part")
      .withColumn("blk", concat_ws("|", col("p_type"), col("p_size")))
      .select(col("blk"), col("p_partkey").as("part_a"),
        split(col("p_name"), " ").as("toks_a"))
    val b = parts.select(col("blk"), col("p_partkey").as("part_b"),
      split(col("p_name"), " ").as("toks_b"))
    val sim = size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
      size(array_union(col("toks_a"), col("toks_b"))).cast("double")
    FuzzyJoin.bestMatch(a, b, "blk", "part_a", "part_b",
      when(col("part_a") === col("part_b"), lit(-1.0)).otherwise(sim))
      .select(col("part_a"), col("part_b").as("best_match"),
        round(col("sim"), 6).as("sim"))
  }

  /** P11: number-family extraction from text columns. */
  def numberExtraction(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"),
        size(split(col("p_name"), " ")).as("n_name_tokens"))

  /** §2.10: REAL Structured Streaming windowed aggregation (file source,
    * watermark, tumbling window, memory sink), drained synchronously. */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    StreamingOps.windowedEventAgg(spark, dir)

  /** Session windows (gap 30 min) over events per user — Spark's
    * `session_window` (the streaming-native session operator, here in
    * batch form; identical semantics under a watermark in streaming).
    * Oracle: classic gaps-and-islands (lag + cumulative sum). */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Backward as-of join (purchase -> latest prior view per user): the
    * attribution-join shape, via [[graft.operators.AsOfJoin]]'s
    * union + single-window merge formulation (no pair explosion; one
    * shuffle per side). Oracle: DuckDB's native ASOF LEFT JOIN. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"))
    graft.operators.AsOfJoin.backward(
        purchases, views, key = "user_id", ts = "ts",
        tiebreak = "view_event_id", rightPrefix = "v_")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("v_view_event_id").as("view_event_id"),
        date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("v_ts"))).as("gap_sec"))
  }

  /** Two-phase salted aggregation — the skew-mitigation pattern for heavy
    * group keys (events has only 5 event_type values; at 100 TB a direct
    * groupBy would hash all rows of one type to one reducer). Phase 1
    * aggregates (key, salt) with 16-way fan-out, phase 2 combines the
    * 16 partials per key. Result is identical to the direct groupBy (the
    * oracle), and both phases keep exact DECIMAL sums. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast(DecimalType(18, 2))).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).cast("double").as("total_value"))

  /** Streaming stateful dedup -> aggregation (dropDuplicates state + agg
    * state chained in one streaming query); oracle = batch
    * count(DISTINCT user_id) per type. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame =
    StreamingOps.dedupCounts(spark, dir)

  /** JSON scalar extraction from the props column (§2.9 surface:
    * get_json_object / from_json family). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))

  /** Text scrubbing (training-data hygiene): redact digit runs, count
    * redactions — regexp_replace/regexp_count composition. */
  def scrub(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"),
        regexp_replace(col("props"), "\\d+", "<NUM>").as("scrubbed"),
        size(split(col("props"), "\\d+")).minus(1).as("n_redactions"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "adv_session_window" -> sessionWindow,
    "adv_json_extract" -> jsonExtract,
    "adv_scrub" -> scrub,
    "adv_rollup" -> rollupAgg,
    "adv_langid_prf" -> langidPrf,
    "adv_fuzzy_best_match" -> fuzzyBestMatch,
    "adv_number_extraction" -> numberExtraction,
    "adv_asof_join" -> asofJoin,
    "adv_salted_agg" -> saltedAgg,
    "stream_window_agg" -> streamWindowAgg,
    "stream_dedup_count" -> streamDedup,
  )

  val oracleSql: Map[String, String] = Map(
    "adv_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    -- STRICTLY greater: session_window merges adjacent windows,
        |    -- i.e. an event exactly gap after the last still extends
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL '30 minutes' OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM islands GROUP BY user_id, session_id""".stripMargin,
    "adv_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin,
    "adv_scrub" ->
      """SELECT event_id,
        |  regexp_replace(props, '\d+', '<NUM>', 'g') AS scrubbed,
        |  CAST(len(string_split_regex(props, '\d+')) - 1 AS INT) AS n_redactions
        |FROM events""".stripMargin,
    "adv_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "adv_langid_prf" -> {
      val inner = AnalysisQueries.oracleSql("ta_langid")
      s"""WITH pred AS ($inner),
         |per_true AS (
         |  SELECT lang, count(*) AS support,
         |    CAST(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS BIGINT) AS tp
         |  FROM pred GROUP BY lang),
         |per_pred AS (
         |  SELECT predicted AS lang, count(*) AS predicted_n FROM pred GROUP BY 1)
         |SELECT t.lang, t.support, t.tp,
         |  coalesce(p.predicted_n, 0) AS predicted_n,
         |  round(CASE WHEN coalesce(p.predicted_n, 0) > 0
         |        THEN t.tp * 1.0 / p.predicted_n ELSE 0.0 END, 4) AS precision,
         |  round(t.tp * 1.0 / t.support, 4) AS recall,
         |  round(CASE WHEN t.tp > 0
         |        THEN 2.0 * (t.tp * 1.0 / p.predicted_n) * (t.tp * 1.0 / t.support)
         |             / (t.tp * 1.0 / p.predicted_n + t.tp * 1.0 / t.support)
         |        ELSE 0.0 END, 4) AS f1
         |FROM per_true t LEFT JOIN per_pred p USING (lang)""".stripMargin
    },
    "adv_fuzzy_best_match" ->
      """WITH t AS (SELECT p_type, p_size, p_partkey, string_split(p_name, ' ') AS toks
        |           FROM part),
        |scored AS (
        |  SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
        |    CASE WHEN a.p_partkey = b.p_partkey THEN -1.0
        |         ELSE len(list_intersect(a.toks, b.toks)) * 1.0
        |              / len(list_distinct(a.toks || b.toks)) END AS sim
        |  FROM t a JOIN t b ON a.p_type = b.p_type AND a.p_size = b.p_size)
        |SELECT part_a, part_b AS best_match, round(sim, 6) AS sim FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY part_a ORDER BY sim DESC, part_b ASC) AS rn
        |  FROM scored) WHERE rn = 1""".stripMargin,
    "adv_number_extraction" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_name_tokens
        |FROM part""".stripMargin,
    "adv_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, ts, event_id AS view_event_id FROM events
        |           WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  v.view_event_id,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        |  date_diff('second', v.ts, p.ts) AS gap_sec
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts""".stripMargin,
    "adv_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type""".stripMargin,
    "stream_dedup_count" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    "stream_window_agg" ->
      """SELECT strftime(time_bucket(INTERVAL '45 minutes', ts), '%Y-%m-%d %H:%M:%S')
        |    AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
  )
}
