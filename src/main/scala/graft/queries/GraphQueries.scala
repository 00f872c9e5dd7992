package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{DfCache, Tables}
import graft.operators.Graph

/** Graph-shaped coverage over the synthetic star schema: co-occurrence
  * pair mining (market-basket shape) and fixed-iteration PageRank over
  * the resulting co-purchase graph.
  *
  * Scale notes:
  *  - pair expansion happens AFTER a groupBy(orderkey) — the per-order
  *    item set is bounded (TPC-H-ish ~4-7 lines), so the O(k^2) blowup is
  *    a small constant per order and the only shuffle key is `l_orderkey`
  *    (then the pair itself for the count). No self-join of the fact
  *    table against itself — the classic formulation shuffles lineitem
  *    twice and joins; this shuffles it once;
  *  - PageRank rounds move zero edge bytes (rank vector broadcast onto
  *    dst-partitioned cached edges — see [[graft.operators.Graph]]);
  *    edges are partitioned once.
  */
object GraphQueries extends graft.QueryModule {

  private val MinSupport = 2
  private val Iters = 3

  /** Sorted per-order distinct item sets — collect_set dedups inside the
    * group, so the one orderkey shuffle replaces a separate distinct
    * pass (same semantics, one fewer full shuffle). */
  private def orderItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Keyed repartition BEFORE the aggregation: the collect_set object
    // agg is the expensive half of this derivation, and without the
    // explicit exchange its partial pass runs on the parquet scan's
    // 1-3 splits (measured 0.85 s on 3 tasks at sf0.1). Hash-keyed
    // repartition is sort-free on the map side (unlike a round-robin
    // spread, which pays sortBeforeRepartition — measured SLOWER), its
    // partitioning satisfies the groupBy (no second exchange), and the
    // object agg then runs at full shuffle parallelism. The count is
    // pinned to defaultParallelism (scale-adaptive: tracks the
    // cluster's cores) because an AQE-coalescible exchange gets merged
    // by BYTES (~8 MB here → 8 tasks at the 1 MB floor) while the cost
    // of this stage is per-row compute (set merge + sort + pair
    // explode), the exact byte-blind-coalesce trap the r17 A/B
    // measured catalog-wide.
    Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey")
      .repartition(spark.sparkContext.defaultParallelism, $"l_orderkey")
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_set($"l_partkey")).as("items"))
  }

  /** Unordered part pairs (pa < pb) co-occurring in an order, one row per
    * (order, pair) — the input both queries below share. */
  private def pairTable(spark: SparkSession, dir: String): DataFrame =
    orderItems(spark, dir)
      .select(explode(graft.operators.Dedup.pairsOf(col("items"))).as("p"))
      .select(col("p._1").as("pa"), col("p._2").as("pb"))

  /** Market-basket co-occurrence: part pairs bought together in at least
    * `MinSupport` orders. */
  def copurchase(spark: SparkSession, dir: String): DataFrame =
    pairTable(spark, dir)
      .groupBy(col("pa").as("part_a"), col("pb").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= MinSupport)

  /** Shared graph bases ([[graft.core.DfCache]]): every downstream
    * entry (pagerank/label-prop/ppr on the distinct pair graph;
    * triangles/k-core/link-pred/assoc-rules on the thresholded
    * co-purchase graph) previously re-derived the base from lineitem
    * (~1.8 s each at sf0.1 — pure recompute, same rows). The PRIMARY
    * `rel_copurchase` entry stays uncached so its bench timing keeps
    * measuring the real derivation; results are bit-identical (the
    * bases are exact integer tables; all float folds happen downstream
    * in ordered form). */
  private def cachedPairs(spark: SparkSession, dir: String): DataFrame =
    DfCache.cached(spark, dir, "graph:pairs")(
      pairTable(spark, dir).distinct())
  private def cachedCopurchase(spark: SparkSession, dir: String): DataFrame =
    DfCache.cached(spark, dir, "graph:copurchase")(copurchase(spark, dir))

  /** 3-round PageRank (d=0.85) over the distinct co-purchase graph;
    * rank_norm = rank x |V| (1.0 = uniform). */
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRank(cachedPairs(spark, dir), Iters)

  /** 3-round deterministic label propagation over the distinct
    * co-purchase graph ([[Graph.labelPropagation]]) — the communities
    * companion to [[pagerank]] (same cached edge layout, integer-exact
    * rounds, full SQL replay). */
  def labelProp(spark: SparkSession, dir: String): DataFrame =
    Graph.labelPropagation(cachedPairs(spark, dir), Iters)

  /** Association rules from the co-purchase pairs: for each directed
    * rule x -> y with pair support >= `MinSupport`,
    * confidence = P(y|x) = c_xy / c_x and lift = c_xy * N / (c_x c_y).
    * Item supports are a second aggregate over the same distinct
    * (order, part) table; both support tables broadcast onto the pair
    * counts (all ratios are bigint divisions in doubles — deterministic
    * with no ordering discipline). */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val itemN = li.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
    val nOrders = li.select($"l_orderkey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val rules = cachedCopurchase(spark, dir)
      .select(explode(array(
        struct($"part_a".as("x"), $"part_b".as("y"), $"n_orders".as("c_xy")),
        struct($"part_b".as("x"), $"part_a".as("y"), $"n_orders".as("c_xy"))))
        .as("r"))
      .select($"r.x".as("antecedent"), $"r.y".as("consequent"), $"r.c_xy")
    rules
      .join(broadcast(itemN.toDF("antecedent", "c_x")), "antecedent")
      .join(broadcast(itemN.toDF("consequent", "c_y")), "consequent")
      .crossJoin(broadcast(nOrders))
      .select($"antecedent", $"consequent", $"c_xy",
        round($"c_xy".cast("double") / $"c_x", 6).as("confidence"),
        round($"c_xy".cast("double") * $"n_orders" / ($"c_x" * $"c_y"), 6)
          .as("lift"))
  }

  /** Triangle enumeration over the support-thresholded co-purchase
    * graph, via TRUE degree-ordered orientation
    * ([[graft.operators.Graph.trianglesByDegree]]): wedges fan out only
    * from each triangle's lowest-(degree, id) node, so a skewed hub
    * never enumerates its neighbor pairs — the per-node wedge bound the
    * id-ordered two-join formulation only approximates. Same rows
    * (id-sorted triples), GraphSpec pins the hub bound on a planted
    * star. */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.trianglesByDegree(
      cachedCopurchase(spark, dir)
        .select(col("part_a").as("pa"), col("part_b").as("pb")))

  private val PprSeeds = 3

  /** Personalized PageRank from the [[PprSeeds]] highest-degree parts
    * ([[Graph.personalizedPageRank]]) — proximity-to-seeds ranking, the
    * similarity-based data-selection signal. Same cached zero-shuffle
    * rounds as [[pagerank]]. */
  def ppr(spark: SparkSession, dir: String): DataFrame =
    Graph.personalizedPageRank(cachedPairs(spark, dir), Iters,
      PprSeeds)

  private val KCoreK = 2
  private val KCoreRounds = 12

  /** [[KCoreK]]-core of the thresholded co-purchase graph
    * ([[Graph.kCore]], fixed [[KCoreRounds]] peel rounds) — the
    * dense-substructure filter of link analysis (keep nodes embedded in
    * a mutually-connected region, drop tendrils). Fixed-round peeling
    * is bit-identical across engines whether or not it has converged;
    * at the test scales it converges well inside the budget (11 rounds
    * worst-case observed). */
  def kcore(spark: SparkSession, dir: String): DataFrame =
    Graph.kCore(
      cachedCopurchase(spark, dir)
        .select(col("part_a").as("pa"), col("part_b").as("pb")),
      KCoreK, KCoreRounds)

  private val LinkPredMaxDeg = 8
  // >= 1: score ALL distance-2 non-adjacent pairs (the standard AA
  // candidate set) — at sf0.1 the thresholded graph is sparse enough
  // (max degree 6) that a >=2 cut leaves zero candidates, a degenerate
  // hash gate
  private val LinkPredMinCn = 1

  /** Common-neighbor / Adamic-Adar link prediction over the thresholded
    * co-purchase graph ([[Graph.adamicAdar]]) — the "parts likely to be
    * bought together next" / related-document suggestion signal. The
    * [[LinkPredMaxDeg]] hub guard triggers at test scale (max
    * co-purchase degree 13 at sf0.01), so the guarded path is what the
    * oracle gates. */
  def linkPred(spark: SparkSession, dir: String): DataFrame =
    Graph.adamicAdar(
      cachedCopurchase(spark, dir)
        .select(col("part_a").as("pa"), col("part_b").as("pb")),
      LinkPredMaxDeg, LinkPredMinCn)

  /** Newman modularity of the label-propagation communities — the
    * partition-quality audit run after any community detection:
    * Q = Σ_c (e_c/m − (D_c/2m)²), reported per community as its
    * additive contribution (e_c = intra-community edges, D_c = degree
    * sum, m = total undirected edges). EVERY accumulated quantity is an
    * exact BIGINT (edge counts, degree sums, their squares live in the
    * per-community rows); the float arithmetic is pointwise from those
    * integers, so the metric replays bit-for-bit with zero ordering
    * discipline. Labels broadcast (the propagation's own regime); the
    * only shuffles are the two community aggregations. */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = cachedPairs(spark, dir)
    // labels via DfCache: the audit re-reads the propagation result
    // instead of re-running 3 rounds (PRIMARY rel_label_prop stays
    // uncached and honest — the graph-family discipline)
    val lbl = broadcast(DfCache.cached(spark, dir, "graph:labels")(
      labelProp(spark, dir)))
    val m = pairs.agg(count(lit(1)).as("m"))
    val withC = pairs
      .join(lbl.select($"node".as("pa"), $"community".as("ca")), "pa")
      .join(lbl.select($"node".as("pb"), $"community".as("cb")), "pb")
    val intra = withC.filter($"ca" === $"cb")
      .groupBy($"ca".as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = pairs.select(explode(array($"pa", $"pb")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    val comm = deg.join(lbl, "node")
      .groupBy($"community")
      .agg(count(lit(1)).as("n_nodes"), sum($"deg").as("degree_sum"))
    val half = $"degree_sum".cast("double") /
      (lit(2.0) * $"m".cast("double"))
    comm.join(intra, Seq("community"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .crossJoin(broadcast(m))
      .select($"community", $"n_nodes", $"intra_edges", $"degree_sum",
        // + 0.0 normalizes the round's -0.0 (a zero-intra community's
        // tiny negative contribution) to +0.0 in both engines
        (round($"intra_edges".cast("double") / $"m".cast("double") -
          half * half, 6) + lit(0.0)).as("q_contrib"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_copurchase" -> copurchase,
    "rel_linkpred" -> linkPred,
    "rel_pagerank" -> pagerank,
    "rel_label_prop" -> labelProp,
    "rel_modularity" -> modularity,
    "rel_assoc_rules" -> assocRules,
    "rel_triangles" -> triangles,
    "rel_kcore" -> kcore,
    "rel_ppr" -> ppr,
  )

  /** DuckDB replay of [[Graph.labelPropagation]]: one generated CTE pair
    * per round — (dst, lbl) counts, then the argmax via a (c DESC,
    * lbl ASC) row_number, the exact Spark max(struct) tie order. */
  private def labelPropOracle: String = {
    def iterCte(i: Int, prev: String) =
      s"""c$i AS (SELECT e.dst, l.lbl, count(*) AS c
         |  FROM e JOIN $prev l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT dst AS node, lbl FROM (
         |  SELECT dst, lbl, row_number() OVER
         |    (PARTITION BY dst ORDER BY c DESC, lbl ASC) AS rn FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to Iters)
      .map(i => iterCte(i, if (i == 1) "l0" else s"l${i - 1}"))
      .mkString(",\n")
    s"""WITH $labelPropCtes,
       |$rounds
       |SELECT node, lbl AS community FROM l$Iters""".stripMargin
  }

  /** [[labelPropOracle]]'s full chain re-wrapped as CTEs ending in
    * `lab(node, community)` — the reusable prefix for audits OVER the
    * propagation result (modularity). */
  private def labelPropChainCtes: String = {
    def iterCte(i: Int, prev: String) =
      s"""c$i AS (SELECT e.dst, l.lbl, count(*) AS c
         |  FROM e JOIN $prev l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT dst AS node, lbl FROM (
         |  SELECT dst, lbl, row_number() OVER
         |    (PARTITION BY dst ORDER BY c DESC, lbl ASC) AS rn FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to Iters)
      .map(i => iterCte(i, if (i == 1) "l0" else s"l${i - 1}"))
      .mkString(",\n")
    s"""$labelPropCtes,
       |$rounds,
       |lab AS (SELECT node, lbl AS community FROM l$Iters)""".stripMargin
  }

  /** Shared CTE chain (graph build + round-0 labels) for the label-prop
    * replay and its downstream modularity audit. */
  private val labelPropCtes =
    s"""li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM pairs
       |     UNION ALL SELECT pb, pa FROM pairs),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM e)""".stripMargin

  /** DuckDB replay of [[Graph.pageRank]]: one generated CTE block per
    * round, every float fold in src order (the Spark side folds a
    * src-sorted list) so doubles are bit-identical across engines. */
  private def pagerankOracle: String = {
    // every literal is cast to DOUBLE before arithmetic: DuckDB would
    // otherwise fold (1.0 - 0.85) in exact DECIMAL (0.15) while Spark
    // subtracts doubles (0.15000000000000002) — a 1-ulp teleport
    // divergence that the bit-equality contract can't absorb
    // two-level contribution fold (src order within RankBlock-sized
    // src-blocks, blk order across) — the engine's rankRound tree
    def iterCte(alias: String, prev: String) =
      s"""$alias AS (SELECT node,
         |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT nn FROM n)
         |  + CAST(0.85 AS DOUBLE) * list_reduce(
         |    list_prepend(0.0, list(s ORDER BY blk)), (a, b) -> a + b) AS pr
         |  FROM (SELECT e.dst AS node, e.src // ${Graph.RankBlock} AS blk,
         |      list_reduce(list_prepend(0.0, list(p.pr / e.d ORDER BY e.src)),
         |        (a, b) -> a + b) AS s
         |    FROM edges e JOIN $prev p ON e.src = p.node
         |    GROUP BY 1, 2)
         |  GROUP BY node)""".stripMargin
    val rounds = (1 to Iters)
      .map(i => iterCte(s"it$i", if (i == 1) "pr0" else s"it${i - 1}"))
      .mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |e0 AS (SELECT pa AS src, pb AS dst FROM pairs
       |       UNION SELECT pb, pa FROM pairs),
       |deg AS (SELECT src, count(*) AS d FROM e0 GROUP BY 1),
       |edges AS (SELECT e0.src, e0.dst, deg.d FROM e0 JOIN deg USING (src)),
       |n AS (SELECT count(*) AS nn FROM deg),
       |pr0 AS (SELECT src AS node,
       |        CAST(1.0 AS DOUBLE) / (SELECT nn FROM n) AS pr FROM deg),
       |$rounds
       |SELECT node, round(pr * (SELECT nn FROM n), 6) AS rank_norm
       |FROM it$Iters""".stripMargin
  }

  /** DuckDB replay of [[Graph.personalizedPageRank]] — the
    * [[pagerankOracle]] chain with seed-confined teleport (seed set =
    * top-[[PprSeeds]] by (degree DESC, id ASC), the same TakeOrdered
    * rule; every float in the engine-wide cast/fold discipline). */
  private def pprOracle: String = {
    // divide by the ACTUAL seed count like the operator (identical when
    // the graph has >= PprSeeds nodes, exact even when it doesn't)
    val seedTele =
      s"""CASE WHEN node IN (SELECT src FROM seeds)
         |  THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |       / CAST((SELECT count(*) FROM seeds) AS DOUBLE)
         |  ELSE CAST(0.0 AS DOUBLE) END""".stripMargin
    // same two-level src-block fold as the pagerank replay; the seed
    // teleport tests the grouped `node` at the outer level
    def iterCte(alias: String, prev: String) =
      s"""$alias AS (SELECT node,
         |  $seedTele
         |  + CAST(0.85 AS DOUBLE) * list_reduce(
         |    list_prepend(0.0, list(s ORDER BY blk)), (a, b) -> a + b) AS pr
         |  FROM (SELECT e.dst AS node, e.src // ${Graph.RankBlock} AS blk,
         |      list_reduce(list_prepend(0.0, list(p.pr / e.d ORDER BY e.src)),
         |        (a, b) -> a + b) AS s
         |    FROM edges e JOIN $prev p ON e.src = p.node
         |    GROUP BY 1, 2)
         |  GROUP BY node)""".stripMargin
    val rounds = (1 to Iters)
      .map(i => iterCte(s"it$i", if (i == 1) "pr0" else s"it${i - 1}"))
      .mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |e0 AS (SELECT pa AS src, pb AS dst FROM pairs
       |       UNION SELECT pb, pa FROM pairs),
       |deg AS (SELECT src, count(*) AS d FROM e0 GROUP BY 1),
       |edges AS (SELECT e0.src, e0.dst, deg.d FROM e0 JOIN deg USING (src)),
       |seeds AS MATERIALIZED (SELECT src FROM deg
       |  ORDER BY d DESC, src ASC LIMIT $PprSeeds),
       |pr0 AS (SELECT src AS node,
       |  CASE WHEN src IN (SELECT src FROM seeds)
       |    THEN CAST(1.0 AS DOUBLE)
       |         / CAST((SELECT count(*) FROM seeds) AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END AS pr FROM deg),
       |$rounds
       |SELECT node, round(pr, 8) AS ppr FROM it$Iters""".stripMargin
  }

  /** DuckDB replay of [[Graph.kCore]]: one (degree, survivors) CTE pair
    * per peel round over the thresholded co-purchase edges — integer
    * counts only, so the replay is exact by construction. */
  private def kcoreOracle: String = {
    val rounds = (1 to KCoreRounds).map { i =>
      val prev = s"a${i - 1}"
      s"""d$i AS MATERIALIZED (SELECT e.src, count(*) AS deg FROM e
         |  JOIN $prev s ON e.src = s.node JOIN $prev t ON e.dst = t.node
         |  GROUP BY e.src),
         |a$i AS MATERIALIZED (SELECT src AS node FROM d$i
         |  WHERE deg >= $KCoreK)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport),
       |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM pairs
       |     UNION ALL SELECT pb, pa FROM pairs),
       |a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |$rounds
       |SELECT src AS node, CAST(deg AS INT) AS core_deg
       |FROM d$KCoreRounds WHERE deg >= $KCoreK""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "rel_linkpred" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport),
         |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM pairs
         |     UNION ALL SELECT pb, pa FROM pairs),
         |deg AS (SELECT src AS mid, count(*) AS d FROM e GROUP BY 1),
         |w AS (SELECT e1.src AS mid, CAST(dg.d AS DOUBLE) AS d,
         |    e1.dst AS a, e2.dst AS b
         |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  JOIN deg dg ON dg.mid = e1.src
         |  WHERE dg.d <= $LinkPredMaxDeg),
         |sc AS (SELECT a AS node_a, b AS node_b,
         |    CAST(count(*) AS INT) AS cn,
         |    list_reduce(
         |      list_prepend(0.0, list(CAST(1.0 AS DOUBLE) / ln(d)
         |                             ORDER BY mid)),
         |      (acc, x) -> acc + x) AS aa
         |  FROM w GROUP BY 1, 2 HAVING count(*) >= $LinkPredMinCn)
         |SELECT node_a, node_b, cn, round(aa, 6) AS aa_score
         |FROM sc ANTI JOIN pairs
         |  ON sc.node_a = pairs.pa AND sc.node_b = pairs.pb""".stripMargin,
    "rel_kcore" -> kcoreOracle,
    "rel_ppr" -> pprOracle,
    "rel_copurchase" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         |  count(*) AS n_orders
         |FROM li a JOIN li b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |GROUP BY 1, 2 HAVING count(*) >= $MinSupport""".stripMargin,
    "rel_pagerank" -> pagerankOracle,
    "rel_label_prop" -> labelPropOracle,
    "rel_modularity" ->
      s"""WITH $labelPropChainCtes,
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
         |intra AS (
         |  SELECT la.community, count(*) AS intra_edges
         |  FROM pairs p
         |  JOIN lab la ON la.node = p.pa
         |  JOIN lab lb ON lb.node = p.pb
         |  WHERE la.community = lb.community GROUP BY 1),
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT pa AS node FROM pairs
         |    UNION ALL SELECT pb FROM pairs) GROUP BY 1),
         |comm AS (
         |  SELECT la.community, count(*) AS n_nodes,
         |    CAST(sum(d.deg) AS BIGINT) AS degree_sum
         |  FROM deg d JOIN lab la ON la.node = d.node GROUP BY 1)
         |SELECT c.community, c.n_nodes,
         |  coalesce(i.intra_edges, 0) AS intra_edges, c.degree_sum,
         |  round(CAST(coalesce(i.intra_edges, 0) AS DOUBLE)
         |      / CAST(m.m AS DOUBLE)
         |    - (CAST(c.degree_sum AS DOUBLE)
         |       / (CAST(2.0 AS DOUBLE) * CAST(m.m AS DOUBLE)))
         |      * (CAST(c.degree_sum AS DOUBLE)
         |       / (CAST(2.0 AS DOUBLE) * CAST(m.m AS DOUBLE))), 6)
         |    + CAST(0.0 AS DOUBLE) AS q_contrib
         |FROM comm c LEFT JOIN intra i USING (community)
         |CROSS JOIN m""".stripMargin,
    "rel_assoc_rules" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |pc AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         |    count(*) AS c_xy
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport),
         |r AS (SELECT pa AS antecedent, pb AS consequent, c_xy FROM pc
         |      UNION ALL SELECT pb, pa, c_xy FROM pc),
         |ic AS (SELECT l_partkey, count(*) AS c FROM li GROUP BY 1),
         |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li)
         |SELECT antecedent, consequent, c_xy,
         |  round(CAST(c_xy AS DOUBLE) / cx.c, 6) AS confidence,
         |  round(CAST(c_xy AS DOUBLE) * n.n_orders / (cx.c * cy.c), 6)
         |    AS lift
         |FROM r JOIN ic cx ON r.antecedent = cx.l_partkey
         |       JOIN ic cy ON r.consequent = cy.l_partkey
         |CROSS JOIN n""".stripMargin,
    "rel_triangles" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport)
         |SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
         |FROM e e1 JOIN e e2 ON e1.pb = e2.pa
         |  JOIN e e3 ON e1.pa = e3.pa AND e2.pb = e3.pb""".stripMargin,
  )
}
