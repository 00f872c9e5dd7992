package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop join
  * (queries are the small side; candidates stream). Correct pattern at any
  * scale when |queries| is small: the big side is never shuffled, each
  * partition scores its vectors against the broadcast queries and emits
  * only (query, candidate, sim) rows; the final top-k is a window over
  * |queries| x |candidates-surviving| rows.
  *
  * Scale path: IVF — partition vectors by nearest centroid (one pass,
  * broadcast centroids), then search only the query's `nprobe` closest
  * centroid buckets. Cuts scored candidates by ~|centroids|/nprobe.
  */
object Similarity {

  /** Fused cosine expression: one pass over both arrays. The arithmetic
    * ORDER is bit-identical to the composed-builtin form
    * `fold(zip_with(a,b,*)) / (sqrt(fold(a^2)) * sqrt(fold(b^2)))` —
    * left-to-right adds, then dot/(na*nb) — which is also what the DuckDB
    * oracle spells out, so results hash-match while skipping three
    * interpreted lambda folds per pair. Codegen-participating: emits a
    * static [[CosineKernel]] call inside whole-stage codegen (this is the
    * innermost expression of every ANN scoring loop — no fallback row
    * materialization or boxing per pair). */
  case class CosineSim(left: org.apache.spark.sql.catalyst.expressions.Expression,
      right: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{DataType, DoubleType}
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(CosineKernel.sim(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.operators.CosineKernel.sim($a, $b)")
    override protected def withNewChildrenInternal(
        l: org.apache.spark.sql.catalyst.expressions.Expression,
        r: org.apache.spark.sql.catalyst.expressions.Expression): CosineSim = copy(l, r)
    override def prettyName: String = "cosine_sim"
  }

  /** Cosine similarity of two double arrays (deterministic — see
    * [[CosineSim]] for the arithmetic-order contract with the oracle). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(CosineSim(
      org.apache.spark.sql.graftbridge.Bridge.expression(a),
      org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  // cast(array<double>), not transform(_, _.cast): higher-order
  // functions are CodegenFallback (interpreted lambda + boxing per
  // element on EVERY ANN row); the array cast is codegen-participating
  // and float->double widening is value-identical either way
  def toDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Shared final stage: per-query bounded top-k via the
    * [[graft.functions.TopKStructs]] partial-top-k aggregate. Only k rows
    * per (query, input-partition) cross the shuffle — the window
    * formulation would move and sort EVERY scored candidate. Ordering
    * (sim DESC, cand_id ASC) encoded as descending (sim, -cand_id). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TextFunctions.top_k_structs(
        struct(col("sim"), (-col("cand_id")).as("neg_id")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), (-col("p.neg_id")).cast("long").as("cand_id"),
        (col("pos") + 1).cast("int").as("rank"),
        round(col("p.sim"), 6).as("sim"))

  /** Exact L2 brute-force top-k (sim = -squared distance, the
    * [[pqTopK]] ranking convention) — the ground truth the
    * compressed-domain searches are recalled against. Same broadcast
    * queries + partial top-k shape as [[bruteForceTopK]]; the distance
    * folds dims left-to-right from 0.0, the engine-wide SQL-replayable
    * order. */
  def l2TopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      toDoubleArray(col("embedding")).as("qv"))
    val c = candidates.select(col("vec_id").as("cand_id"),
      toDoubleArray(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("sim", -aggregate(zip_with(col("qv"), col("cv"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))
    rankTopK(scored, k)
  }

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * candidates (excluding itself). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      toDoubleArray(col("embedding")).as("qv"))
    val c = candidates.select(col("vec_id").as("cand_id"),
      toDoubleArray(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** MMR (maximal-marginal-relevance) diversified top-k rerank
    * (Carbonell & Goldstein 1998): from one query vector, retrieve the
    * `kCand` most-relevant candidates by cosine, then greedily select
    * `k` of them maximizing `lambdaRel*rel - lambdaDiv*maxSimToSelected`
    * — the diversity-aware sampling step a training-data pipeline runs
    * after ANN retrieval. The RETRIEVAL stage is the scale path
    * (broadcast 1-row query, partial top-k — only kCand structs per
    * partition cross the shuffle); the GREEDY stage is a bounded driver
    * computation over kCand vectors (kCand x dim doubles — a query
    * parameter, never corpus-scale, same budget class as
    * [[centroidsLit]]). Deterministic cross-engine: unrounded-double
    * argmax with cand_id ASC tiebreaks at both stages, cosine in the
    * engine-wide fold order ([[CosineKernel]]). */
  def mmrRerank(query: DataFrame, candidates: DataFrame, kCand: Int, k: Int,
      lambdaRel: Double, lambdaDiv: Double): DataFrame = {
    val spark = candidates.sparkSession
    val q = query.select(toDoubleArray(col("embedding")).as("qv"))
    val scored = candidates
      .select(col("vec_id").as("cand_id"),
        toDoubleArray(col("embedding")).as("cv"))
      .crossJoin(broadcast(q))
      .withColumn("rel", cosine(col("qv"), col("cv")))
    // rel then neg_id decide the order before cv is ever compared, and
    // neg_id is unique — cv just rides along so the pool needs no re-join
    val pool = scored
      .groupBy()
      .agg(graft.functions.TextFunctions.top_k_structs(
        struct(col("rel"), (-col("cand_id")).as("neg_id"), col("cv")),
        kCand).as("top"))
      .select(explode(col("top")).as("p"))
      .select((-col("p.neg_id")).cast("long").as("cand_id"),
        col("p.rel").as("rel"), col("p.cv").as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val remaining =
      scala.collection.mutable.LinkedHashMap(pool.map(p => p._1 -> p).toIndexedSeq: _*)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val sel = Seq.newBuilder[(Int, Long, Double, Double)]
    var r = 1
    while (r <= math.min(k, pool.length)) {
      var bestId = Long.MinValue
      var bestScore = Double.NegativeInfinity
      var bestRel = 0.0
      // ascending-id iteration + strict > keeps the LOWEST id on exact
      // score ties — the ORDER BY score DESC, cand_id LIMIT 1 contract
      remaining.valuesIterator.foreach { case (id, rel, v) =>
        val pen = if (chosen.isEmpty) 0.0
          else chosen.iterator.map(s => cos(v, s)).max
        val score = lambdaRel * rel - lambdaDiv * pen
        if (score > bestScore) { bestScore = score; bestId = id; bestRel = rel }
      }
      sel += ((r, bestId, bestRel, bestScore))
      chosen += remaining(bestId)._3
      remaining.remove(bestId)
      r += 1
    }
    import spark.implicits._
    sel.result().toDF("sel_rank", "vec_id", "rel", "mmr_score")
      .select(col("sel_rank"), col("vec_id"), round(col("rel"), 6).as("rel"),
        round(col("mmr_score"), 6).as("mmr_score"))
  }

  /** Centroid table collected to a single array literal — the dim-table
    * broadcast pattern taken to its limit: |centroids| ~ sqrt(n) rows of
    * a few hundred bytes, well inside driver/task budgets, and every
    * executor evaluates against it with NO join or shuffle. */
  private def centroidsLit(centroids: DataFrame): Column = {
    import org.apache.spark.sql.functions.typedLit
    val (ids, vecs) = centroidsArr(centroids)
    typedLit(ids.zip(vecs.map(_.toSeq)).toSeq)
  }

  /** Driver-side codebook in id-ascending order — the reference-object
    * form the fused [[AnnKernels]] expressions take (plan source stays
    * constant across codebooks; no literal array in the plan). Same
    * budget class as [[centroidsLit]]. */
  private def centroidsArr(
      centroids: DataFrame): (Array[Long], Array[Array[Double]]) = {
    val rows = centroids
      .select(col("vec_id").cast("long"), toDoubleArray(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  /** IVF index: assign every vector to its nearest centroid, bucketing
    * the corpus. `centroids` must be small (k-means-style sqrt(n)).
    *
    * Pure PROJECTION: the centroid list rides along as an array literal
    * and the argmax is `array_max` over per-centroid (csim, -id) structs
    * — the corpus is never shuffled, joined, or aggregated to get its
    * bucket assignment. Tiebreak (csim DESC, centroid_id ASC) encoded in
    * the struct order. Input columns ride through unchanged (so a caller
    * can keep side columns — e.g. a true label for nearest-centroid
    * classification — without a re-join), except the reserved internal
    * names `__dv`/`__best`, which would be clobbered. */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    require(!vectors.columns.contains("__dv")
        && !vectors.columns.contains("__best"),
      "ivfAssign: input must not carry the reserved columns __dv/__best")
    // fused argmax kernel (r17): the legacy array_max(transform(cents,
    // struct(cosine, -id))) walked the codebook with interpreted
    // lambdas per corpus row; [[AnnKernels.nearestId]] is the same
    // argmax (csim DESC, id ASC tiebreak via Double.compare — Spark's
    // exact double total order) inside whole-stage codegen.
    val (ids, vecs) = centroidsArr(centroids)
    vectors
      .withColumn("__dv", toDoubleArray(col("embedding")))
      .withColumn("centroid_id", AnnKernels.nearestIdCol(col("__dv"), ids, vecs))
      .drop("__dv")
  }

  /** Hard-negative mining (contrastive-training data prep): for each
    * query vector, the k most cosine-similar candidates carrying a
    * DIFFERENT label — the negatives that sit closest to the decision
    * boundary. Same scale shape as [[bruteForceTopK]]: queries broadcast,
    * candidates scanned once, per-query bounded partial top-k — the
    * label-mismatch predicate rides on the broadcast join, so same-label
    * candidates never reach the scorer. */
  def hardNegativesTopK(queries: DataFrame, candidates: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("label").as("qlabel"), toDoubleArray(col("embedding")).as("qv"))
    val c = candidates.select(col("vec_id").as("cand_id"),
      col("label").as("clabel"), toDoubleArray(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("qlabel") =!= col("clabel"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** IVF search: score only candidates in the query's `nprobe` closest
    * centroid buckets. Returns same shape as bruteForceTopK (approximate). */
  def ivfTopK(queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cents = centroidsLit(centroids)
    val q = queries.select(col("vec_id").as("query_id"),
      toDoubleArray(col("embedding")).as("qv"))
    // per query: its nprobe nearest centroids — sort/slice/explode over
    // the centroid literal, a pure projection (no join, no shuffle).
    // array_sort on (-csim, id) is the (csim DESC, centroid_id ASC)
    // tiebreak.
    val probes = q
      .withColumn("p", explode(slice(array_sort(transform(cents, c =>
        struct((-cosine(col("qv"), c("_2"))).as("neg_sim"),
          c("_1").as("centroid_id")))), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("p.centroid_id").as("centroid_id"))
    // candidates restricted to probed buckets (equi-join on centroid_id)
    val cand = assigned.select(col("vec_id").as("cand_id"),
      toDoubleArray(col("embedding")).as("cv"), col("centroid_id"))
    val scored = cand.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** Stream-safe IVF top-k, up to the per-query aggregate: the same
    * probes / bucket-restricted candidates as [[ivfTopK]], reoriented
    * for Structured Streaming — the STREAM side (arriving queries)
    * stays streaming (probe selection is a pure projection over the
    * centroid literal), candidates attach stream-static on the bucket
    * equi-key, and the per-query top-k is the bounded partial
    * aggregate ([[graft.functions.TextFunctions.top_k_structs]] over
    * (sim, −cand_id) structs — the (sim DESC, cand_id ASC) order)
    * instead of a rank window (non-time windows are unsupported on
    * streams; the partial agg is also the 100 TB shape — k structs per
    * partition cross the shuffle). Returns the streaming aggregate
    * (query_id, top); the caller drains it and explodes ranks
    * batch-side. */
  def ivfTopKStreamAgg(queries: DataFrame, assigned: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = centroidsLit(centroids)
    val q = queries.select(col("vec_id").as("query_id"),
      toDoubleArray(col("embedding")).as("qv"))
    val probes = q
      .withColumn("p", explode(slice(array_sort(transform(cents, c =>
        struct((-cosine(col("qv"), c("_2"))).as("neg_sim"),
          c("_1").as("centroid_id")))), 1, nprobe)))
      .select(col("query_id"), col("qv"),
        col("p.centroid_id").as("centroid_id"))
    val cand = assigned.select(col("vec_id").as("cand_id"),
      toDoubleArray(col("embedding")).as("cv"), col("centroid_id"))
    probes.join(cand, Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TextFunctions.top_k_structs(
        struct(col("sim"), (-col("cand_id")).as("neg_id")), k).as("top"))
  }

  /** Product quantization encode (the IVF-PQ compression standard):
    * split each vector into `m` subspaces of `dim/m` dims, code each
    * subvector as the 1-based POSITION of its nearest codeword in that
    * subspace's codebook (L2, tie-break lowest position). Codebooks are
    * anchor-derived (the [[ivfAssign]] centroid rule: a small
    * deterministic sample's subvectors), so encoding is a PURE
    * PROJECTION — the codebook literal rides along, argmin per subspace
    * is `array_min` over (dist, code) structs, and the corpus never
    * shuffles to get its codes. Returns (vec_id, codes array<int>,
    * recon_err): an m-byte-ish code per vector (the 8-32x memory
    * compression ANN at 100 TB rests on) plus the exact reconstruction
    * error. Anchors encode to themselves (recon_err 0 — spec-pinned). */
  def pqEncode(vectors: DataFrame, anchors: DataFrame, m: Int,
      dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"pq: dim $dim not divisible by m $m")
    val sub = dim / m
    // fused encode kernel (r17): the legacy per-subspace
    // array_min(transform(cents, struct(aggregate(zip_with(slice,
    // slice)), code))) nest was m * |codebook| interpreted lambda
    // evaluations per corpus row; [[AnnKernels.pqEncode]] runs the
    // same argmins (dist fold dim-ascending from 0.0; dist ASC, code
    // ASC tiebreak via Double.compare) in one codegen'd pass, packed
    // as [codes..., recon] (codes are small ints — exact as doubles).
    val (_, vecs) = centroidsArr(anchors)
    vectors
      .select(col("vec_id"),
        AnnKernels.pqEncodeCol(toDoubleArray(col("embedding")), vecs, m, sub)
          .as("pk"))
      .select(col("vec_id"),
        slice(col("pk"), 1, m).cast("array<int>").as("codes"),
        round(sqrt(element_at(col("pk"), m + 1)), 6).as("recon_err"))
  }

  /** PQ asymmetric-distance top-k (ADC): each query precomputes its
    * per-subspace distance TABLE against the codebook (m x |codebook|
    * doubles, built once on the broadcast side), and every encoded
    * candidate is scored with just m table lookups + adds — never
    * touching the original vectors. This is the compressed-domain scan
    * that makes billion-vector ANN affordable; approximate family
    * (recall spec vs the exact L2 top-k, like IVF/RP-LSH). */
  def pqTopK(queries: DataFrame, encoded: DataFrame, anchors: DataFrame,
      k: Int, m: Int, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"pq: dim $dim not divisible by m $m")
    val sub = dim / m
    // fused ADC table kernel (r17) — see [[AnnKernels.pqDistTable]]:
    // same per-(subspace, codeword) squared-L2 folds as the legacy
    // array(transform(cents, aggregate(zip_with(slice, slice)))) nest,
    // one codegen'd pass instead of m * |codebook| interpreted lambdas
    val (_, vecs) = centroidsArr(anchors)
    val qt = queries
      .select(col("vec_id").as("query_id"),
        toDoubleArray(col("embedding")).as("qv"))
      .withColumn("dtab",
        AnnKernels.pqDistTableCol(col("qv"), vecs, m, sub))
      .select(col("query_id"), col("dtab"))
    val dist = (0 until m).map(j =>
      element_at(element_at(col("dtab"), j + 1),
        element_at(col("codes"), j + 1))).reduceLeft(_ + _)
    val scored = encoded.select(col("vec_id").as("cand_id"), col("codes"))
      .join(broadcast(qt), col("query_id") =!= col("cand_id"))
      .withColumn("sim", -dist) // rankTopK orders sim DESC = distance ASC
    rankTopK(scored, k)
  }

  /** IVF-PQ search — the composed billion-scale ANN topology: IVF
    * probing narrows the corpus to `nprobe` buckets (cosine probe
    * selection, as [[ivfTopK]]), and candidates inside them are scored
    * in the COMPRESSED domain with the ADC distance tables of
    * [[pqTopK]] — so the scan touches only m-byte codes bucketed by
    * centroid, never the original vectors. `encoded` must carry
    * (vec_id, codes, centroid_id) — [[pqEncode]] joined to
    * [[ivfAssign]]. */
  def ivfPqTopK(queries: DataFrame, encoded: DataFrame, anchors: DataFrame,
      centroids: DataFrame, k: Int, m: Int, nprobe: Int,
      dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"pq: dim $dim not divisible by m $m")
    val sub = dim / m
    val (_, cbVecs) = centroidsArr(anchors)
    val cents = centroidsLit(centroids)
    // per query: ADC distance table (fused kernel — see
    // [[AnnKernels.pqDistTable]]) + nprobe probed buckets, both built
    // once on the broadcast side
    val qt = queries
      .select(col("vec_id").as("query_id"),
        toDoubleArray(col("embedding")).as("qv"))
      .withColumn("dtab",
        AnnKernels.pqDistTableCol(col("qv"), cbVecs, m, sub))
      .withColumn("p", explode(slice(array_sort(transform(cents, c =>
        struct((-cosine(col("qv"), c("_2"))).as("neg_sim"),
          c("_1").as("centroid_id")))), 1, nprobe)))
      .select(col("query_id"), col("dtab"), col("p.centroid_id").as("centroid_id"))
    val dist = (0 until m).map(j =>
      element_at(element_at(col("dtab"), j + 1),
        element_at(col("codes"), j + 1))).reduceLeft(_ + _)
    val scored = encoded.select(col("vec_id").as("cand_id"), col("codes"),
        col("centroid_id"))
      .join(broadcast(qt), Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", -dist)
    rankTopK(scored, k)
  }

  /** Random-hyperplane LSH signatures (SimHash for vectors): for each of
    * `tables` hash tables, a `bits`-bit signature where bit b =
    * sign(dot(v, r_tb)) over a deterministic Rademacher (+-1) hyperplane
    * r_tb. P(bit match) = 1 - angle/pi, so close vectors collide in some
    * table with high probability. One pass: tables x bits x dim
    * multiply-adds per vector, no shuffle. Input must be array<double>. */
  /** Static kernel for [[RpLshSig]] (callable from generated code). */
  def rpLshSigKernel(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      nt: Int, nb: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    import graft.functions.Mix.fmix64
    require(nb >= 1 && nb <= 63 && nt >= 1, s"rp_lsh: bad tables=$nt bits=$nb")
    val dim = arr.numElements()
    val out = new Array[Any](nt)
    var t = 0
    while (t < nt) {
      var sig = 0L
      var b = 0
      while (b < nb) {
        var dot = 0.0
        var i = 0
        while (i < dim) {
          // Rademacher component from one integer mix — the "random"
          // hyperplane, identical on every executor with no broadcast
          val s = if ((fmix64(t * 1048573L + b * 8191L + i) & 1L) == 0L) 1.0 else -1.0
          dot += arr.getDouble(i) * s
          i += 1
        }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class RpLshSig(child: org.apache.spark.sql.catalyst.expressions.Expression,
      tables: org.apache.spark.sql.catalyst.expressions.Expression,
      bits: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
    override def first = child
    override def second = tables
    override def third = bits
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any, tv: Any, bv: Any): Any =
      rpLshSigKernel(v.asInstanceOf[ArrayData],
        tv.asInstanceOf[Int], bv.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, t, b) =>
        s"graft.operators.Similarity.rpLshSigKernel($v, $t, $b)")
    override protected def withNewChildrenInternal(
        f: org.apache.spark.sql.catalyst.expressions.Expression,
        s: org.apache.spark.sql.catalyst.expressions.Expression,
        t: org.apache.spark.sql.catalyst.expressions.Expression): RpLshSig = copy(f, s, t)
    override def prettyName: String = "rp_lsh_sig"
  }

  def rpLshSig(v: Column, tables: Int, bits: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(RpLshSig(
      org.apache.spark.sql.graftbridge.Bridge.expression(v),
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(tables)),
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(bits))))

  /** LSH-bucketed approximate top-k: queries and corpus are bucketed by
    * (table, signature); only bucket-colliding pairs are scored. The
    * corpus side shuffles (table, sig, id) rows — never O(n^2) pairs —
    * and the scored candidate set shrinks by the signature selectivity
    * (~2^-bits per table for unrelated vectors). Same output shape as
    * [[bruteForceTopK]]; recall is the SimilaritySpec contract. */
  def rpLshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      tables: Int = 32, bits: Int = 8): DataFrame = {
    val c = candidates.select(col("vec_id").as("cand_id"),
      toDoubleArray(col("embedding")).as("cv"))
      .select(col("cand_id"), col("cv"),
        posexplode(rpLshSig(col("cv"), tables, bits)).as(Seq("tbl", "sig")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDoubleArray(col("embedding")).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(rpLshSig(col("qv"), tables, bits)).as(Seq("tbl", "sig")))
    val cand = c.join(broadcast(q), Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("cand_id"))
      .dropDuplicates("query_id", "cand_id")
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(cand, k)
  }

  /** RP-LSH-blocked near-duplicate pairs: candidates = vectors colliding
    * in any (table, signature) bucket, verified by exact cosine >=
    * threshold. The 100 TB path for [[cosineNearDups]]: the corpus
    * shuffles as (tbl, sig, id, vec) rows and only bucket collisions are
    * scored — never an all-pairs product. Recall follows the sign-LSH
    * collision curve (high for true near-dups, best-effort at moderate
    * thresholds — DedupSpec pins the bound on the planted data). */
  /** Broadcast ceiling for the [[rpLshNearDups]] vector re-attach: the
    * id→vector table is broadcast only while its estimated serialized
    * size stays under this — n-proportional broadcasts need an explicit
    * ceiling, however candidate-independent they are. */
  private[graft] val RpLshBroadcastCeiling = 256L << 20

  def rpLshNearDups(vectors: DataFrame, threshold: Double,
      tables: Int = 32, bits: Int = 8,
      broadcastCeiling: Long = RpLshBroadcastCeiling): DataFrame = {
    val base = vectors.select(col("vec_id"),
      toDoubleArray(col("embedding")).as("dv"))
    // Bucket join on IDS ONLY: carrying the vector payload through the
    // 32-table explode would shuffle each embedding 32× and then move
    // BOTH vectors with every collision row into the dedup exchange —
    // measured 122 s at the 10× frame vs ids-only. The re-attach must
    // not undo this: a shuffle join on vec_b would move every candidate
    // row ALREADY CARRYING va through a second exchange (measured ~12 GB
    // at the 10× frame — 33 s for a query whose only real work is
    // n·L signature rows plus the per-candidate cosine). So the vector
    // table re-attaches by BROADCAST while its measured size estimate
    // fits [[RpLshBroadcastCeiling]] — it is candidate-count independent
    // (one row per vector, not per collision) but still n-proportional,
    // so an unconditional hint would blow the executor/broadcast memory
    // ceiling long before 100 TB; past the ceiling the hint is dropped
    // and the planner's shuffle join pays the candidate-sized exchange
    // that `bits` (below) keeps bounded — and the pair dedup
    // runs AFTER the threshold filter — identical output (sim is a pure
    // function of the pair, so distinct-then-verify and
    // verify-then-distinct commute), but the distinct's exchange is
    // output-sized instead of candidate-sized. Re-verified multiplicity
    // is the per-pair table-collision count — ~1.1× for random
    // collisions, bounded by L. The remaining scale knob is `bits`:
    // random-collision candidates are L·n²/2^bits, so a 100 TB corpus
    // tunes bits ≈ log2(n) (and L for recall) — candidate volume, and
    // with it every downstream cost, is an index-tuning constant, not a
    // plan shape. Oracled via the sf-gate DuckDB replay; recall vs the
    // exact quadratic pinned in DedupSpec.
    val v = base
      .select(col("vec_id"), posexplode(rpLshSig(col("dv"), tables, bits))
        .as(Seq("tbl", "sig")))
    val cand = v.select(col("tbl"), col("sig"), col("vec_id").as("vec_a"))
      .join(v.select(col("tbl"), col("sig"), col("vec_id").as("vec_b")),
        Seq("tbl", "sig"))
      .filter(col("vec_a") < col("vec_b"))
    // one cheap agg job sizes the broadcast gate: rows × (8·dim payload
    // + row overhead) against the ceiling — measured, not stats-derived,
    // so a projection the planner can't size never forces a bad hint
    val st = base.agg(count(lit(1)).as("n"), max(size(col("dv"))).as("d"))
      .head
    val estBytes = st.getLong(0) *
      (8L * (if (st.isNullAt(1)) 0 else st.getInt(1)) + 32L)
    def reattach(side: DataFrame): DataFrame =
      if (estBytes <= broadcastCeiling) broadcast(side) else side
    cand
      .join(reattach(base.select(col("vec_id").as("vec_a"),
        col("dv").as("va"))), "vec_a")
      .join(reattach(base.select(col("vec_id").as("vec_b"),
        col("dv").as("vb"))), "vec_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") > threshold)
      .dropDuplicates("vec_a", "vec_b")
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
  }

  /** Symmetric int8 quantization of an embedding (vector compression for
    * training-data pipelines: 4x smaller than float32, 8x than float64):
    * scale = max|x| / 127, q_i = clamp(round(x_i / scale), -127, 127).
    * Returns (scale, qs, max_abs_err) columns; reconstruction error is
    * bounded by scale/2 per dimension by construction. Pure projection —
    * compresses a 100 TB embedding column with no shuffle. */
  def quantizeInt8(emb: Column): (Column, Column, Column) = {
    val dv = toDoubleArray(emb)
    val scale = aggregate(transform(dv, x => abs(x)), lit(0.0),
      (acc, x) => greatest(acc, x)) / 127.0
    val qs = transform(dv, x =>
      when(scale =!= 0.0,
        least(lit(127.0), greatest(lit(-127.0), round(x / scale, 0))))
        .otherwise(lit(0.0)).cast("int"))
    val maxErr = aggregate(
      zip_with(dv, qs, (x, q) => abs(q.cast("double") * scale - x)),
      lit(0.0), (acc, e) => greatest(acc, e))
    (scale, qs, maxErr)
  }

  /** Block size of the Lloyd-update mean fold — shared with the DuckDB
    * replay, and small enough that the gate SFs really exercise the
    * cross-block level (500 vectors at sf0.001/sf0.01 = 2 blocks). */
  private[graft] val KmBlock = 256L

  /** Deterministic Lloyd k-means over the embedding column — the topic-
    * clustering step of a corpus pipeline (cluster-then-sample /
    * cluster-balance curation). Engine-reproducible by construction, so
    * it is fully ORACLE-checkable, unlike library k-means:
    *
    *  - init: the vectors with the `k` smallest ids (no RNG);
    *  - assignment: L2 argmin as `min(struct(dist, cluster))` — a plain
    *    aggregation with partial combine (map-side argmin), never a
    *    row_number window; ties break to the smallest cluster id;
    *  - update: per-dimension TWO-LEVEL mean fold — vec_id order within
    *    [[KmBlock]]-sized blocks, blk order across — so the
    *    `ordered_sum` collect buffers are block-bounded, never
    *    corpus-bounded (the same fixed-fold-tree discipline as
    *    [[blockedMoments]]; a flat per-(cluster, dim) fold buffers
    *    n/k elements per group, which grows with the corpus) (the
    *    [[graft.queries.SimilarityQueries.centroidDist]] discipline), so
    *    float sums are identical across engines and partitionings;
    *  - each round's centroids (k x dim doubles) round-trip through the
    *    driver and re-enter the plan as literals — iteration i+1 starts
    *    from values, not lineage, and assignment needs no join at all.
    *
    * Clusters that lose all members simply drop out of the centroid
    * table (both engines agree). Returns the final assignment
    * (vec_id, cluster, dist). */
  def kmeans(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    // each Lloyd round plus the final assignment is its own action over
    // the same projected vectors — cache them once (k x dim doubles per
    // row; the projection, not the source table) instead of re-scanning
    // and re-spreading the input `iters + 2` times. Stays cached for the
    // returned assignment's lineage, so no unpersist here.
    val e = vectors.select(col("vec_id"),
      toDoubleArray(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // centroids live on the DRIVER between rounds (k x dim doubles — the
    // one structure of the algorithm that is tiny at any corpus scale;
    // this is the standard distributed-k-means shape: broadcast/literal
    // centroids out, aggregate means back). Literalizing them makes the
    // assignment a pure per-row projection: argmin = first element of
    // sort_array over (dist, cluster) structs — no join, no shuffle.
    // seeds = the k SMALLEST ids (deterministic; a TakeOrdered, not a
    // sort) — `vec_id < k` would silently collect ZERO seeds on
    // non-dense or non-zero-based id spaces and label every vector
    // cluster -1; the guard keeps any remaining shortfall loud
    var cent: Seq[(Int, Seq[Double])] = e
      .orderBy(col("vec_id"))
      .limit(k)
      .select(col("vec_id").cast("int").as("cluster"), col("v"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1).toSeq
    require(cent.nonEmpty, "kmeans: no seed vectors (empty input?)")
    // assignment kernel as a closure UDF, NOT a literal-array expression:
    // k x dim literals inlined into the plan force a fresh Janino compile
    // of a 500-constant method every round (measured: it costs what the
    // shuffle-free formulation saves). The closure keeps the plan shape
    // constant across rounds and datasets; the fold order inside is
    // exactly the SQL fold's (left-to-right dims, acc + (x-y)^2, first
    // minimum wins = smallest cluster id on ties).
    def best: Column = {
      val centArr = cent.map { case (id, cv) => (id, cv.toArray) }.toArray
      val assignUdf = udf { (v: Seq[Double]) =>
        var bd = Double.MaxValue
        var bc = -1
        var ci = 0
        while (ci < centArr.length) {
          val cv = centArr(ci)._2
          var acc = 0.0
          var i = 0
          while (i < cv.length) {
            val d = v(i) - cv(i); acc += d * d; i += 1
          }
          if (acc < bd) { bd = acc; bc = centArr(ci)._1 }
          ci += 1
        }
        (bd, bc)
      }
      assignUdf(col("v")).cast("struct<dist:double,cluster:int>")
    }
    var it = 0
    while (it < iters) {
      // per-dim member fold in vec_id order (the centroidDist discipline)
      // -> (cluster, pos, mean); the k x dim result is collected and
      // re-literalized for the next round. Clusters that lose every
      // member drop out here, same as the oracle's join semantics.
      val means = e
        .select(col("vec_id"), best.getField("cluster").as("cluster"),
          expr(s"vec_id div $KmBlock").as("blk"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"), col("blk"))
        .agg(graft.functions.TextFunctions.ordered_sum(
          col("x"), col("vec_id")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cluster"), col("pos"))
        .agg((graft.functions.TextFunctions.ordered_sum(
          col("s"), col("blk")) / sum(col("n"))).as("c"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      cent = means.groupBy(_._1).toSeq.map { case (cl, xs) =>
        cl -> xs.sortBy(_._2).map(_._3).toSeq
      }.sortBy(_._1)
      it += 1
    }
    e.select(col("vec_id"), best.getField("cluster").as("cluster"),
      round(sqrt(best.getField("dist")), 6).as("dist"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * blocked by label. TEST ORACLE, not a production operator: within a
    * block this is all-pairs quadratic, so a popular label at scale is a
    * scale-killer by construction. It exists as the exact ground truth
    * that DedupSpec's recall contract pins [[rpLshNearDups]] (the
    * production path) against. */
  def cosineNearDups(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("label"), col("vec_id").as("vec_a"),
      toDoubleArray(col("embedding")).as("va"))
    val b = vectors.select(col("label"), col("vec_id").as("vec_b"),
      toDoubleArray(col("embedding")).as("vb"))
    a.join(b, Seq("label")).filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") > threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
  }

  /** Blocked second-moment partials for covariance/PCA — the
    * scale-correct replacement for the exploded d×d self-join.
    *
    * The naive formulation (posexplode → self-join on vec_id →
    * `ordered_sum` per (i, j) cell) shuffles n·d²/2 product rows and
    * buffers an n-element `collect_list` per cell — per-group state
    * grows with the corpus, the by-construction cliff at scale
    * (measured: the 30× frame's first run spent most of its time in
    * collect-buffer GC). Here every moment contribution is folded
    * LOCALLY: vectors are hash-partitioned by `blk = vec_id div block`,
    * sorted (blk, vec_id) within partitions, and a per-partition kernel
    * folds each block's d(d+1)/2 upper-triangle products plus its d
    * per-dim sums in vec_id order into a fixed d²-sized accumulator.
    * Only (n/block)·d² partial rows reach the final per-cell fold — the
    * shuffle shrinks by ~block× and task state is O(d²), corpus-size
    * independent.
    *
    * Float-order contract (what keeps the DuckDB replay bit-exact):
    * within a block, each cell folds its contributions in ascending
    * vec_id order (every row of a block lives in exactly one partition,
    * so the partition sort fixes the order under any partition count or
    * AQE re-plan); across blocks, callers fold the partials with
    * `ordered_sum(s, blk)` — a two-level fixed fold tree, the
    * [[graft.operators.LinearModel]] / centroid-drift discipline applied
    * to the d² moment matrix.
    *
    * Output rows: `(blk, i, j, s)` with 1-based dims; `j >= 1` rows are
    * upper-triangle product sums Σ x_i·x_j, and `j = 0` marks the
    * per-dim plain sums Σ x_i (both needed by the covariance; emitting
    * them from the same pass saves a second scan). */
  def blockedMoments(emb: DataFrame, block: Long): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb
      .select(expr(s"vec_id div $block").as("blk"), col("vec_id"),
        col("embedding"))
      .repartition(col("blk"))
      .sortWithinPartitions(col("blk"), col("vec_id"))
      .as[(Long, Long, Array[Float])]
      .mapPartitions { rows =>
        val buf = rows.buffered
        new Iterator[(Long, Int, Int, Double)] {
          private var pending: Iterator[(Long, Int, Int, Double)] =
            Iterator.empty
          // first-seen dim is PARTITION-scoped, not block-scoped: a
          // corpus whose dim changes between blocks (uniform within
          // each) must fail as loudly as one ragged within a block —
          // a per-block reset would silently merge mixed-dim partials
          // into the same (i, j) cells
          private var d = -1
          def hasNext: Boolean = pending.hasNext || buf.hasNext
          def next(): (Long, Int, Int, Double) = {
            if (!pending.hasNext) {
              val blk = buf.head._1
              var tri: Array[Double] = null
              var sums: Array[Double] = null
              while (buf.hasNext && buf.head._1 == blk) {
                val e = buf.next()._3
                if (d < 0) d = e.length
                if (tri == null) {
                  tri = new Array[Double](d * (d + 1) / 2)
                  sums = new Array[Double](d)
                }
                require(e.length == d, s"ragged embedding dim: ${e.length} != $d")
                // same arithmetic as the exploded form: each float is
                // cast to double once, then multiplied — cell (i, j)
                // receives its contributions in ascending vec_id order
                var i = 0
                var t = 0
                while (i < d) {
                  val xi = e(i).toDouble
                  sums(i) += xi
                  var j = i
                  while (j < d) { tri(t) += xi * e(j).toDouble; t += 1; j += 1 }
                  i += 1
                }
              }
              val dd = d
              val triOut = tri
              val sumOut = sums
              pending =
                Iterator.tabulate(dd)(i => (blk, i + 1, 0, sumOut(i))) ++
                  new Iterator[(Long, Int, Int, Double)] {
                    private var i = 0; private var j = 0; private var t = 0
                    def hasNext: Boolean = t < triOut.length
                    def next(): (Long, Int, Int, Double) = {
                      val r = (blk, i + 1, i + j + 1, triOut(t))
                      t += 1; j += 1
                      if (i + j == dd) { i += 1; j = 0 }
                      r
                    }
                  }
            }
            pending.next()
          }
        }
      }
      .toDF("blk", "i", "j", "s")
  }
}
