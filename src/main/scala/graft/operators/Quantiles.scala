package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe quantile bucketing (SQL `ntile` without the global sort).
  *
  * `ntile(k) OVER (ORDER BY score, tiebreak)` forces an
  * `Exchange SinglePartition`: one task sorts every row. This
  * formulation keeps the row stream distributed:
  *
  *  - the score DISTRIBUTION (distinct value -> count) is
  *    dimension-sized; a window over IT yields each value's
  *    strictly-below cumulative count, broadcast back onto the rows;
  *  - within a score tie group, rank comes from a window PARTITIONED by
  *    score (per-group bounded sort, ordered by the tiebreak);
  *  - a row's 0-based global position is below + tie_rank - 1, and the
  *    ntile bucket is pure arithmetic over it: with n rows, the first
  *    n mod k buckets take ceil(n/k) rows, the rest floor(n/k).
  *
  * Total-count `n` is also derived without a second pass of the scoring
  * kernel — callers pass `total` (usually an `agg(count)` over a pruned
  * scan of the same source).
  */
object Quantiles {

  /** Append an `out` column with the 1-based ntile bucket of each row
    * under (`score` ASC, `tiebreak` ASC). `total` must be a 1-row frame
    * with a `n` column = df row count. Exactly SQL
    * `ntile(k) OVER (ORDER BY score, tiebreak)` for any n and k,
    * including n < k (each row gets its own bucket i+1).
    *
    * SCALE CONTRACT: the one unpartitioned window here runs over the
    * score DISTRIBUTION, so it is bounded only because callers pass a
    * score of bounded cardinality — every caller in this repo rounds to
    * 4 dp first (<= 10^4 cells by construction). The contract is
    * ENFORCED (r11): a distribution wider than `maxCells` (default 2^20
    * — orders of magnitude above any legitimate caller, far below
    * row counts at scale) raises at runtime instead of silently
    * running the n-cell single-task sort this operator exists to avoid
    * (QuantilesSpec pins both sides). Round or bucket the score before
    * calling. */
  /** Working-column names; inputs must not collide (loud, not a silent
    * ambiguous-reference/drop — the ivfAssign guard discipline). `n` is
    * claimed too: the broadcast total's count column joins the rows. */
  private val Reserved = Seq("__q", "__g", "__tie", "__below", "n")

  private def guardReserved(df: DataFrame, op: String): Unit = {
    val hit = df.columns.toSeq.intersect(Reserved)
    require(hit.isEmpty,
      s"$op: input columns ${hit.mkString(", ")} collide with reserved " +
        s"working names (${Reserved.mkString(", ")}) — rename before calling")
  }

  /** The cell-cardinality CONTRACT, enforced (was a convention until
    * r11): the guarded column errors the job when the score
    * distribution exceeds `maxCells` — a continuous per-row score
    * silently degenerates the distribution window into the single-task
    * n-row sort this operator exists to avoid, so misuse now fails
    * LOUDLY instead (QuantilesSpec pins it). Rides the distribution
    * frame's existing single-partition window stage: zero extra jobs,
    * zero cost on the legitimate (bounded-cell) path. */
  private def guardedBelow(wc: org.apache.spark.sql.expressions.WindowSpec,
      op: String, maxCells: Int): Column =
    when(count(lit(1)).over(wc) <= maxCells, col("__below"))
      .otherwise(raise_error(concat(
        lit(s"$op: score distribution has "), count(lit(1)).over(wc),
        lit(s" cells (> maxCells=$maxCells) — discretize the score " +
          "(round/bucket) before calling; a per-row-distinct score " +
          "degenerates to the single-task ntile sort this operator " +
          "exists to avoid"))))

  def ntileBy(df: DataFrame, score: Column, tiebreak: Column, k: Int,
      total: DataFrame, out: String = "bucket",
      maxCells: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"ntile: k must be >= 1, got $k")
    guardReserved(df, "ntileBy")
    val scored = df.withColumn("__q", score)
    val dist = scored.groupBy(col("__q")).agg(count(lit(1)).as("c"))
    val wv = Window.orderBy(col("__q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wc = Window.partitionBy(lit(0))
    val cum = dist
      .withColumn("__below", coalesce(sum(col("c")).over(wv), lit(0L)))
      .select(col("__q"), guardedBelow(wc, "ntileBy", maxCells).as("__below"))
    val wt = Window.partitionBy(col("__q")).orderBy(tiebreak)
    val kL = lit(k.toLong)
    val i = col("__below") + col("__tie") - lit(1L) // 0-based global position
    val base = floor(col("n") / kL).cast("long")    // floor(n/k) rows/bucket
    val rem = col("n") % kL                         // first `rem` take one more
    val big = (base + lit(1L)) * rem                // rows in the bigger buckets
    val bucket = when(i < big, floor(i / (base + lit(1L))))
      .otherwise(rem + floor((i - big) / base)) + lit(1L)
    scored
      .withColumn("__tie", row_number().over(wt).cast("long"))
      .join(broadcast(cum), "__q")
      .crossJoin(broadcast(total))
      .withColumn(out, bucket.cast("int"))
      .drop("__q", "__below", "__tie", "n")
  }

  /** Grouped variant: the 1-based ntile bucket of each row WITHIN its
    * `group`, under (`score` ASC, `tiebreak` ASC) — exactly SQL
    * `ntile(k) OVER (PARTITION BY group ORDER BY score, tiebreak)`.
    * Same machinery as [[ntileBy]] with every window additionally
    * partitioned by the group, so nothing ever funnels to a single task
    * (the per-group distributions replace the global one). `totals`
    * must carry (`__g`-compatible group value, `n` = group row count);
    * it is dimension-sized (one row per group) and broadcasts. */
  def ntileWithin(df: DataFrame, group: Column, score: Column,
      tiebreak: Column, k: Int, totals: DataFrame, out: String = "bucket",
      maxCells: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"ntile: k must be >= 1, got $k")
    guardReserved(df, "ntileWithin")
    val scored = df.withColumn("__g", group).withColumn("__q", score)
    val dist = scored.groupBy(col("__g"), col("__q"))
      .agg(count(lit(1)).as("c"))
    val wv = Window.partitionBy(col("__g")).orderBy(col("__q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wc = Window.partitionBy(col("__g"))
    val cum = dist
      .withColumn("__below", coalesce(sum(col("c")).over(wv), lit(0L)))
      .select(col("__g"), col("__q"),
        guardedBelow(wc, "ntileWithin", maxCells).as("__below"))
    val wt = Window.partitionBy(col("__g"), col("__q")).orderBy(tiebreak)
    val kL = lit(k.toLong)
    val i = col("__below") + col("__tie") - lit(1L)
    val base = floor(col("n") / kL).cast("long")
    val rem = col("n") % kL
    val big = (base + lit(1L)) * rem
    val bucket = when(i < big, floor(i / (base + lit(1L))))
      .otherwise(rem + floor((i - big) / base)) + lit(1L)
    scored
      .withColumn("__tie", row_number().over(wt).cast("long"))
      .join(broadcast(cum), Seq("__g", "__q"))
      .join(broadcast(totals.withColumnRenamed(
        totals.columns.head, "__g")), "__g")
      .withColumn(out, bucket.cast("int"))
      .drop("__g", "__q", "__below", "__tie", "n")
  }
}
