package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._


/** Fused ANN scan kernels (r17 optimization) — the [[CosineKernel]] /
  * [[Similarity.CosineSim]] pattern applied to the remaining interpreted
  * hot loops of the IVF/PQ family.
  *
  * The previous formulations walked the codebook with Catalyst
  * higher-order functions (`array_max(transform(cents, ...))`,
  * per-subspace `aggregate(zip_with(slice, slice, ...))`): higher-order
  * functions are CodegenFallback — every corpus row paid |C| interpreted
  * lambda evaluations with per-element boxing (measured: the ivfAssign /
  * pqEncode projections dominated their entries at sf0.1, e.g. a 0.38 s
  * single-task broadcast build for 50 query rows). Each expression here
  * is whole-stage-codegen-participating (a static kernel call via
  * `addReferenceObj`, no boxing, no lambda dispatch) and keeps the
  * generated source CONSTANT across codebooks and datasets (the codebook
  * is a referenced object, not inlined literals — the
  * [[Similarity.kmeans]] plan-stability discipline).
  *
  * Arithmetic parity is bit-exact with the replaced expressions (and so
  * with the DuckDB oracle replays): dims fold left-to-right from 0.0;
  * argmin/argmax comparisons use `java.lang.Double.compare`, which is
  * exactly Spark's total order for doubles (NaN greatest, -0.0 < 0.0);
  * iteration follows the codebook's id-ascending order, so first-wins
  * strict comparisons reproduce the struct-ordering tiebreaks
  * (csim DESC, id ASC / dist ASC, code ASC). AnnKernelParitySpec pins
  * kernel == legacy-expression bitwise, ties and NaN included. */
object AnnKernels {

  /** argmax_j Double.compare on cosine(v, vecs(j)), ids ascending;
    * equal keys keep the smaller id — the array_max(struct(csim, -id))
    * contract of the legacy ivfAssign expression. */
  def nearestId(v: ArrayData, ids: Array[Long],
      vecs: Array[Array[Double]]): Long = {
    var bestId = 0L
    var bestSim = Double.NaN
    var first = true
    var j = 0
    while (j < vecs.length) {
      val s = CosineKernel.simArr(v, vecs(j))
      if (first || java.lang.Double.compare(s, bestSim) > 0) {
        bestSim = s; bestId = ids(j); first = false
      }
      j += 1
    }
    bestId
  }

  /** PQ encode: per subspace j of `m`, the 1-based position of the
    * nearest codeword by squared L2 over dims [j*sub, (j+1)*sub) —
    * dist fold dim-ascending from 0.0, argmin first-wins on
    * Double.compare (= dist ASC, code ASC) — plus the summed best
    * distances in subspace order. Packed as [code_0..code_{m-1}, recon]
    * doubles (codes are small ints, exactly representable). */
  def pqEncode(v: ArrayData, vecs: Array[Array[Double]], m: Int,
      sub: Int): ArrayData = {
    val out = new Array[Double](m + 1)
    var recon = 0.0
    var j = 0
    while (j < m) {
      var bestD = Double.NaN
      var bestCode = 0
      var c = 0
      while (c < vecs.length) {
        val cw = vecs(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val off = j * sub + i
          val x = v.getDouble(off) - cw(off)
          d += x * x
          i += 1
        }
        if (c == 0 || java.lang.Double.compare(d, bestD) < 0) {
          bestD = d; bestCode = c + 1
        }
        c += 1
      }
      out(j) = bestCode.toDouble
      recon += bestD
      j += 1
    }
    out(m) = recon
    new GenericArrayData(out)
  }

  /** ADC distance table: dtab(j)(c) = squared L2 between query and
    * codeword `c` over subspace `j` dims, folds dim-ascending from 0.0
    * — the legacy array(transform(cents, aggregate(zip_with(slice,
    * slice)))) nest, one kernel pass. */
  def pqDistTable(v: ArrayData, vecs: Array[Array[Double]], m: Int,
      sub: Int): ArrayData = {
    val rows = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val row = new Array[Double](vecs.length)
      var c = 0
      while (c < vecs.length) {
        val cw = vecs(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val off = j * sub + i
          val x = v.getDouble(off) - cw(off)
          d += x * x
          i += 1
        }
        row(c) = d
        c += 1
      }
      rows(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  /** Column builders. `centroids` arrive as the driver-side
    * (id-ascending) codebook — [[Similarity.centroidsArr]]. */
  def nearestIdCol(dv: Column, ids: Array[Long],
      vecs: Array[Array[Double]]): Column =
    bridge(NearestCentroidIdExpr(expr(dv), ids, vecs))
  def pqEncodeCol(dv: Column, vecs: Array[Array[Double]], m: Int,
      sub: Int): Column =
    bridge(PqEncodeExpr(expr(dv), vecs, m, sub))
  def pqDistTableCol(qv: Column, vecs: Array[Array[Double]], m: Int,
      sub: Int): Column =
    bridge(PqDistTableExpr(expr(qv), vecs, m, sub))

  private def bridge(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)
}

/** See [[AnnKernels.nearestId]]. Child: array<double> vector. */
case class NearestCentroidIdExpr(child: Expression, ids: Array[Long],
    vecs: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    AnnKernels.nearestId(v.asInstanceOf[ArrayData], ids, vecs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("nnIds", ids, "long[]")
    val vecsRef = ctx.addReferenceObj("nnVecs", vecs, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.operators.AnnKernels.nearestId($v, $idsRef, $vecsRef)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroidIdExpr =
    copy(child = c)
  override def prettyName: String = "nearest_centroid_id"
}

/** See [[AnnKernels.pqEncode]]. Child: array<double> vector. */
case class PqEncodeExpr(child: Expression, vecs: Array[Array[Double]],
    m: Int, sub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    AnnKernels.pqEncode(v.asInstanceOf[ArrayData], vecs, m, sub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("pqVecs", vecs, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.operators.AnnKernels.pqEncode($v, $vecsRef, $m, $sub)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** See [[AnnKernels.pqDistTable]]. Child: array<double> query vector. */
case class PqDistTableExpr(child: Expression, vecs: Array[Array[Double]],
    m: Int, sub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullSafeEval(v: Any): Any =
    AnnKernels.pqDistTable(v.asInstanceOf[ArrayData], vecs, m, sub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("pqVecs", vecs, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.operators.AnnKernels.pqDistTable($v, $vecsRef, $m, $sub)")
  }
  override protected def withNewChildInternal(c: Expression): PqDistTableExpr =
    copy(child = c)
  override def prettyName: String = "pq_dist_table"
}
