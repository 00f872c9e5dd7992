package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-classifier training by full-batch gradient descent
  * — the model-based quality-filtering step of a web-corpus pipeline
  * (CCNet / LLaMA-style: train a lightweight scorer on labeled seed
  * data, score every document, keep the high-scoring slice). The
  * reference has no model stage; this implements the Spark-native shape:
  * the weight vector (a handful of doubles) lives on the driver and
  * re-enters each round as literals, and each round is ONE bounded
  * aggregation over the cached feature projection — exactly the
  * [[Similarity.kmeans]] iteration discipline applied to a linear model.
  *
  * The link is the softsign sigmoid `p = 0.5*(1 + z/(1+|z|))` rather
  * than the exp-logistic: every operation is IEEE-exact (+,*,/,|.|), so
  * training is bit-identical across engines and replayable in SQL —
  * the property the engine's oracle contract is built on (a transcendental
  * `exp` is only faithfully-rounded, which would make 20 GD rounds only
  * approximately reproducible). The GD update is the standard
  * `w -= lr * mean((p - y) * x)`; with a monotone link and a convex-ish
  * loss surface the separator converges the same way the logistic one
  * does.
  *
  * Float-sum determinism: gradients fold in a FIXED two-level order —
  * per [[BlockSize]]-row id-block in id order (bounded groups, map-side
  * partial), then across block sums in block order. Like the
  * [[Quantiles]] distribution windows, the second level is bounded by
  * construction only at catalog scale (n / BlockSize rows in one group);
  * a production run at 10^12 rows would use plain `sum` (order-tolerant,
  * the [[Graph.pageRank]] note) or add a third level.
  */
object LinearModel {

  /** Rows per first-level gradient fold block (id div BlockSize). */
  val BlockSize = 1024

  /** Softsign link: 0.5 * (1 + z / (1 + |z|)) — (0,1)-valued, monotone,
    * built only from IEEE-exact ops. */
  def softsign(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** Linear response for a trained weight vector (bias head, then one
    * weight per feature column, left-to-right fold order — the order
    * the SQL replay uses). */
  def response(w: Array[Double], xCols: Seq[String]): Column =
    xCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }

  /** Full-batch GD on `feats` (one row per example: unique `idCol`,
    * double feature columns `xCols`, 0/1 double label `yCol`). The
    * caller persists `feats` (it is scanned `iters` times plus once for
    * the count). Returns the weight vector (bias first). */
  def trainSoftsignGd(feats: DataFrame, idCol: String, xCols: Seq[String],
      yCol: String, learnRate: Double, iters: Int): Array[Double] = {
    val d = xCols.length + 1
    // a pre-materialized `blk` column means the caller partitioned the
    // cache by it — the level-1 groupBy then aggregates partition-local
    // with NO per-round exchange (the pageRank partitioning-reuse move;
    // 20 GD rounds each saving a shuffle is the difference between a
    // round costing a task wave and costing a stage pair)
    val hasBlk = feats.columns.contains("blk")
    val n = feats.count().toDouble
    require(n > 0, "trainSoftsignGd needs a non-empty feature table")
    val w = Array.fill(d)(0.0)
    var it = 0
    while (it < iters) {
      val err = (softsign(response(w, xCols)) - col(yCol)).as("err")
      val blkCol =
        if (hasBlk) col("blk") else expr(s"$idCol div $BlockSize").as("blk")
      val projected = feats.select(
        col(idCol) +: blkCol +: err +: xCols.map(col): _*)
      val lvl1 = (0 until d).map { j =>
        val v = if (j == 0) col("err") else col("err") * col(xCols(j - 1))
        graft.functions.TextFunctions.ordered_sum(v, col(idCol)).as(s"g$j")
      }
      val lvl2 = (0 until d).map(j =>
        graft.functions.TextFunctions.ordered_sum(col(s"g$j"), col("blk"))
          .as(s"g$j"))
      val row = projected.groupBy(col("blk"))
        .agg(lvl1.head, lvl1.tail: _*)
        .agg(lvl2.head, lvl2.tail: _*)
        .collect()(0)
      var j = 0
      while (j < d) {
        w(j) = w(j) - learnRate * (row.getDouble(j) / n)
        j += 1
      }
      it += 1
    }
    w
  }
}
