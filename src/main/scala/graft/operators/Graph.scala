package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators over edge tables derived from relational data.
  *
  * The reference has no graph stage; this extends the engine with the
  * corpus-link-analysis shape a training-data pipeline needs (rank pages /
  * documents by citation structure before sampling). PageRank is the
  * canonical iterative-join workload, and the Spark-first formulation is:
  *
  *  - the edge table (with each source's out-degree attached) is computed
  *    once, repartitioned by `src`, and persisted — every round's join
  *    then only shuffles the rank vector (16-byte rows), never the edges;
  *  - rounds chain lazily (no driver-side collect of ranks); only the
  *    node count — one scalar, the same structure k-means keeps on the
  *    driver — is read eagerly;
  *  - the per-node contribution sum folds a src-ordered list, so float
  *    addition order is fixed under any partitioning/AQE re-plan — the
  *    [[Similarity]] reproducibility discipline. At production scale the
  *    fold can be a plain `sum` (order tolerance is acceptable there);
  *    the ordered fold is what makes the op oracle-checkable.
  *
  * At 100 TB: per-round cost is one shuffle of the rank vector onto the
  * edge partitioning plus one partial-combined aggregation keyed by `dst`.
  * For deep iteration counts, checkpoint the rank vector every few rounds
  * to truncate lineage (not needed at the fixed 3 rounds used here).
  */
object Graph {

  /** Undirected edges -> both-direction directed edge list with the
    * out-degree `d` of each `src` attached. Input must be deduplicated
    * pairs with `a < b`. */
  def directedWithDegree(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(pairs.select(col("pb").as("src"), col("pa").as("dst")))
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    edges.join(deg, "src")
  }

  /** Fixed-iteration PageRank (damping `d`) over an undirected pair table
    * (`pa < pb`). Returns (node, rank_norm) where rank_norm = rank * n
    * (relative to the uniform distribution; keeps the rounded value
    * scale-independent). */
  def pageRank(pairs: DataFrame, iters: Int, damping: Double = 0.85)
      : DataFrame = {
    val edges = directedWithDegree(pairs)
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the one eager scalar: |V| (every node of the undirected graph
    // appears as a src, so the degree table's size is the node count)
    val n = edges.select("src").distinct().count()
    // (1.0 - damping) is evaluated the same way in the DuckDB oracle
    // ((1.0 - 0.85) / n) so the teleport term is bit-identical
    val teleport = (lit(1.0) - lit(damping)) / lit(n.toDouble)

    // pr(v) = (1-d)/n + d * fold_{u in N(v), src-ordered}(pr(u)/deg(u))
    def round1(pr: DataFrame): DataFrame =
      edges.join(pr, edges("src") === pr("node"))
        .select(col("dst"), col("src"), (col("pr") / col("d")).as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg((teleport + lit(damping) * aggregate(
          transform(array_sort(collect_list(struct(col("src"), col("contrib")))),
            s => s.getField("contrib")),
          lit(0.0), (acc, v) => acc + v)).as("pr"))

    val pr0 = edges.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1.0) / lit(n.toDouble))
    val prN = (1 to iters).foldLeft(pr0)((pr, _) => round1(pr))
    prN.select(col("node"),
      round(col("pr") * lit(n.toDouble), 6).as("rank_norm"))
  }
}
