package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.queries.{GraphQueries, SimilarityQueries}

class GraphSpec extends SparkSpec {
  private val sess = SparkSpec.spark
  import sess.implicits._

  test("pagerank conserves rank mass and converges toward degree order") {
    // star + triangle: hub 0 connected to 1..4; triangle 5-6-7
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L)).toDF("pa", "pb")
    val pr = Graph.pageRank(pairs, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 8)
    // rank_norm is rank * n, so the total mass is n
    assert(math.abs(pr.values.sum - 8.0) < 1e-4, pr.toString)
    // the hub outranks every leaf; triangle members tie by symmetry
    assert(pr(0L) > pr(1L) && pr(0L) > pr(5L))
    assert(math.abs(pr(5L) - pr(6L)) < 1e-12)
    assert(pr(1L) == pr(2L) && pr(2L) == pr(3L))
  }

  test("degree-ordered triangles: exact on a planted graph, hub emits no wedges") {
    // hub 0 touches every leaf 1..50 (and id-orders FIRST, the worst
    // case for id-ordered orientation: 50*49/2 wedges at the hub);
    // leaf edges (1,2) and (3,4) close two triangles through the hub
    val pairs = ((1L to 50L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L)))
      .toDF("pa", "pb")
    val tris = Graph.trianglesByDegree(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tris == Set((0L, 1L, 2L), (0L, 3L, 4L)))
    // degree orientation: every hub edge points INTO the hub, so the
    // hub's out-degree is 0 and no task ever enumerates its neighbor
    // pairs; the max out-degree anywhere stays O(sqrt(m))
    val outDeg = Graph.orientByDegree(pairs)
      .groupBy($"src").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!outDeg.contains(0L), s"hub must have zero out-edges: $outDeg")
    assert(outDeg.values.max <= 2, s"out-degree must stay bounded: $outDeg")
  }

  test("adamic-adar: exact on a planted graph, edges excluded, hub middle skipped") {
    // triangle 0-1-2 (all pairs adjacent -> nothing survives the
    // anti-join), square 3-4-5-6 (diagonals (3,5)/(4,6) each reachable
    // through two degree-2 middles), star center 10 with 9 leaves
    // (degree 9 > cap 8 -> skipped as middle, so no leaf-pair floods)
    val pairs = (Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (4L, 5L), (5L, 6L), (3L, 6L)) ++
      (11L to 19L).map(i => (10L, i))).toDF("pa", "pb")
    val got = Graph.adamicAdar(pairs, maxMiddleDeg = 8, minCn = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getDouble(3))))
      .toMap
    val twoOverLn2 = BigDecimal(2.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      (3L, 5L) -> ((2, twoOverLn2)),
      (4L, 6L) -> ((2, twoOverLn2))), got.toString)
  }

  test("adamic-adar matches a naive reference on seeded random graphs") {
    val cap = 6
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 25
      val pairs = (for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.12
      } yield (a.toLong, b.toLong)).toVector
      val adj = pairs.foldLeft(Map.empty[Long, Set[Long]].withDefaultValue(
        Set.empty[Long])) { case (m, (a, b)) =>
        m.updated(a, m(a) + b).updated(b, m(b) + a)
      }
      // naive: for every non-adjacent (a < b), the capped shared middles
      val expect = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if !adj(a).contains(b)
        mids = (adj(a) & adj(b)).filter(z => adj(z).size <= cap)
        if mids.nonEmpty
      } yield {
        val aa = mids.toSeq.sorted
          .foldLeft(0.0)((acc, z) => acc + 1.0 / math.log(adj(z).size))
        (a, b) -> ((mids.size,
          BigDecimal(aa).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
      }).toMap
      val got = Graph.adamicAdar(pairs.toDF("pa", "pb"), cap, minCn = 1)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getInt(2), r.getDouble(3)))).toMap
      assert(got == expect, s"seed $seed: ${got.size} vs ${expect.size}")
    }
  }

  test("copurchase equals the brute-force self-join on the same data") {
    val brute = {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select($"l_orderkey", $"l_partkey").distinct()
      val a = li.toDF("k", "pa")
      val b = li.toDF("k", "pb")
      a.join(b, Seq("k")).filter($"pa" < $"pb")
        .groupBy($"pa", $"pb").agg(count(lit(1)).as("n_orders"))
        .filter($"n_orders" >= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val got = GraphQueries.copurchase(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
  }

  test("pair expansion plan has no join of the fact table against itself") {
    val plan = GraphQueries.copurchase(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"copurchase should aggregate + explode, not self-join:\n$plan")
  }

  test("pagerank round is shuffle-free: agg sits directly on the broadcast join") {
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)).toDF("pa", "pb")
    val plan = Graph.pageRank(pairs, 3).queryExecution.executedPlan.toString
    // the text before the first cached-edges scan is the outermost
    // round's fragment: final agg -> partial agg -> project -> broadcast
    // join. A shuffle there would mean every round re-partitions.
    val top = plan.substring(0, plan.indexOf("InMemoryTableScan") max 0)
    assert(top.contains("BroadcastHashJoin"), plan)
    assert(!top.contains("Exchange hashpartitioning"),
      s"per-round shuffle detected in round fragment:\n$top")
  }

  test("pagerank matches an independent naive implementation on a random graph") {
    // seeded random graph; the reference implementation below shares NO
    // structure with the engine or its DuckDB oracle (plain nested
    // loops), so a conceptual bug common to both would surface here
    val rnd = new scala.util.Random(42)
    val n = 30
    val pairSet = (0 until 120).map { _ =>
      val a = rnd.nextInt(n); val b = rnd.nextInt(n)
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.filter(p => p._1 != p._2).distinct
    val nodes = pairSet.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val neigh = nodes.map { v =>
      v -> pairSet.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }.sorted
    }.toMap
    var pr = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 1 to 3)
      pr = nodes.map { v =>
        v -> ((1.0 - 0.85) / nodes.size +
          0.85 * neigh(v).map(u => pr(u) / neigh(u).size).sum)
      }.toMap
    val expected = pr.map { case (v, p) => v -> p * nodes.size }

    val got = Graph.pageRank(pairSet.toDF("pa", "pb"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - expected(v)) < 1e-6,
        s"node $v: engine $r vs naive ${expected(v)}")
    }
  }

  test("label propagation matches a naive synchronous implementation") {
    // star + triangle + an isolated edge: communities must separate
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L), (8L, 9L)).toDF("pa", "pb")
    def naive(iters: Int): Map[Long, Long] = {
      val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
        (5L, 6L), (5L, 7L), (6L, 7L), (8L, 9L))
        .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      val adj = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      var lbl = adj.keys.map(v => v -> v).toMap
      for (_ <- 0 until iters) {
        lbl = adj.map { case (v, ns) =>
          val counts = ns.groupBy(lbl).view.mapValues(_.size)
          v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      lbl
    }
    for (iters <- 1 to 3) {
      val got = Graph.labelPropagation(pairs, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive(iters), s"iters=$iters")
    }
    // the triangle converges to one community distinct from the star;
    // the isolated 2-cycle oscillates under SYNCHRONOUS updates (the
    // textbook bipartite swap — after an odd round 8 and 9 hold each
    // other's label), which the naive parity above already pins
    val fin = Graph.labelPropagation(pairs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(5L, 6L, 7L).map(fin).size == 1)
    assert(fin(8L) == 9L && fin(9L) == 8L)
    assert(fin(5L) != fin(0L))
  }

  test("label propagation matches the naive reference on seeded random graphs") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 25
      val pairSet = (0 until 70).map { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(p => p._1 != p._2).distinct
      val neigh = pairSet.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = neigh.keys.map(v => v -> v).toMap
      for (_ <- 1 to 3)
        lbl = neigh.map { case (v, ns) =>
          val counts = ns.groupBy(lbl).view.mapValues(_.size)
          v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      val got = Graph.labelPropagation(pairSet.toDF("pa", "pb"), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == lbl, s"seed $seed")
    }
  }

  test("label propagation on the co-purchase graph compresses to few communities") {
    val comms = GraphQueries.labelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(comms.nonEmpty)
    val nComms = comms.map(_._2).distinct.length
    assert(nComms < comms.length,
      s"no community structure found: $nComms labels for ${comms.length} nodes")
    // every community label is itself a node of the graph
    val nodes = comms.map(_._1).toSet
    assert(comms.forall(c => nodes.contains(c._2)))
  }

  test("closed-form diversity equals the brute-force pairwise mean") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
    val brute = emb.as("a").join(emb.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.label".as("label"), aggregate(
        zip_with($"a.embedding", $"b.embedding",
          (x, y) => (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("sq"))
      .groupBy($"label").agg(avg($"sq").as("mean_sq"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val closed = SimilarityQueries.diversity(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(closed.keySet == brute.keySet)
    closed.foreach { case (label, v) =>
      assert(math.abs(v - brute(label)) < 1e-4,
        s"label $label: closed $v vs brute ${brute(label)}")
    }
  }

  test("personalized pagerank: mass conserved, confined to the seed component") {
    // component A: hub 0 with leaves 1..4 (hub = top degree -> seed);
    // component B: triangle 10-11-12, unreachable from any seed
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("pa", "pb")
    val ppr = Graph.personalizedPageRank(pairs, iters = 8, nSeeds = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr.size == 8)
    // no dangling nodes and teleport sums to (1-d): total mass stays 1
    assert(math.abs(ppr.values.sum - 1.0) < 1e-6, ppr.toString)
    // the seed (hub, degree 4) dominates; the seedless component gets 0
    assert(ppr(0L) > ppr(1L))
    Seq(10L, 11L, 12L).foreach(v => assert(ppr(v) == 0.0, s"$v: ${ppr(v)}"))
    // proximity ordering: leaves adjacent to the seed outrank nothing in
    // their own tier (symmetry) but are strictly positive
    assert(ppr(1L) > 0.0 && ppr(1L) == ppr(2L))
  }

  test("k-core keeps the planted dense core, drops tendrils; extra rounds are no-ops") {
    // triangle 1-2-3 (the 2-core) + chain 3-4-5 (peels) + isolated edge 6-7
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L)).toDF("pa", "pb")
    val core = Graph.kCore(pairs, k = 2, rounds = 6).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(core == Map(1L -> 2, 2L -> 2, 3L -> 2), core.toString)
    // converged peeling is a fixpoint: doubling the round budget changes nothing
    val more = Graph.kCore(pairs, k = 2, rounds = 12).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(more == core)
  }

  test("k-core matches a naive driver-side fixpoint peel on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 2) {
      val n = 40L
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.12
      } yield (a, b)).toSeq
      var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
      var deg = Map.empty[Long, Int]
      var changed = true
      while (changed) {
        deg = alive.iterator.map(v => v -> edges.count { case (a, b) =>
          (a == v && alive(b)) || (b == v && alive(a)) }).toMap
        val next = alive.filter(deg(_) >= 3)
        changed = next != alive
        alive = next
      }
      val expected = alive.map(v => v -> deg(v)).toMap
      val got = Graph.kCore(edges.toDF("pa", "pb"), k = 3, rounds = 20)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"trial $trial: $got vs $expected")
    }
  }

  test("modularity: contributions match a naive driver recomputation; Q in [-1, 1]") {
    val rows = GraphQueries.modularity(spark, sf).collect()
    val labels = GraphQueries.labelProp(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
      .groupBy(_._1).values
      .flatMap(es => es.map(_._2).sorted.combinations(2).map(c => (c(0), c(1))))
      .toSet
    val m = pairs.size
    val intra = pairs.groupBy { case (a, b) => labels(a) }
      .view.mapValues(_.count { case (a, b) => labels(a) == labels(b) }).toMap
    val deg = pairs.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val degSum = deg.groupBy { case (n, _) => labels(n) }
      .view.mapValues(_.values.sum).toMap
    assert(rows.map(_.getAs[Long]("degree_sum")).sum === 2L * m)
    val q = rows.map(_.getAs[Double]("q_contrib")).sum
    assert(q >= -1.0 && q <= 1.0)
    rows.foreach { r =>
      val c = r.getAs[Long]("community")
      assert(r.getAs[Long]("degree_sum") === degSum(c), s"community $c")
      val e = intra.getOrElse(c, 0)
      val naive = e.toDouble / m -
        math.pow(degSum(c).toDouble / (2.0 * m), 2)
      assert(math.abs(r.getAs[Double]("q_contrib") - naive) < 1e-6,
        s"community $c: ${r.getAs[Double]("q_contrib")} vs $naive")
    }
  }

  test("rankBase memo: bounded entries, evictions unpersist, plan-equal frames share") {
    val sc = sess.sparkContext
    Graph.rankBasesClear()
    assert(Graph.rankBaseCount === 0)
    val before = sc.getPersistentRDDs.keySet
    // N distinct graphs (distinct literal data -> distinct canonical
    // plans), N > the slot cap: a long-lived service feeding many
    // spec-local graphs must not accumulate persisted edge caches
    val n = Graph.RankBaseSlots + 3
    (0 until n).foreach { i =>
      val pairs = Seq((i.toLong, i + 100L), (i.toLong, i + 200L),
        (i + 100L, i + 200L)).toDF("pa", "pb")
      assert(Graph.pageRank(pairs, iters = 1).count() === 3)
      assert(Graph.rankBaseCount <= Graph.RankBaseSlots,
        s"memo must stay bounded after graph $i")
    }
    // evicted edge caches are unpersisted: net new persisted RDDs is at
    // most one per resident slot (the edges frame), never one per graph
    val newPersisted = sc.getPersistentRDDs.keySet.diff(before)
    assert(newPersisted.size <= Graph.RankBaseSlots,
      s"evictions must unpersist: ${newPersisted.size} new persisted RDDs")
    // plan-equal (but object-distinct) frames share one entry
    Graph.rankBasesClear()
    val mk = () => Seq((1L, 2L), (2L, 3L)).toDF("pa", "pb")
    val r1 = Graph.pageRank(mk(), iters = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r2 = Graph.pageRank(mk(), iters = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Graph.rankBaseCount === 1,
      "structurally equal pair plans must share one memo entry")
    assert(r1 === r2)
    Graph.rankBasesClear()
  }
}
