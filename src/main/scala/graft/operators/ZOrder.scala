package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data layout.
  *
  * A 100 TB table is pruned at the SCAN (partition / row-group min-max),
  * and min-max pruning only works when the layout clusters the filtered
  * columns. A 1-D sort clusters one column and scatters the rest; the
  * Morton interleave maps a 2-D key to a 1-D order that preserves
  * locality in BOTH dimensions, so range-partitioning by the z-key gives
  * every partition a small rectangle of the key space and a 2-D box
  * predicate touches few partitions (the Delta/Iceberg OPTIMIZE ZORDER
  * semantics, built from plain codegen'd bit arithmetic — no custom
  * expression needed).
  *
  * Reference scope: beyond the reference (it has no storage layout
  * layer); standard published technique (Morton 1966).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (the classic
    * magic-number dilation). Pure bit arithmetic — whole-stage codegen
    * keeps it in the generated loop. */
  def spread16(c: Column): Column = {
    val s1 = c.bitwiseAND(lit(65535L))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 8))).bitwiseAND(lit(16711935L))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 4))).bitwiseAND(lit(252645135L))
    val s4 = (s3.bitwiseOR(shiftleft(s3, 2))).bitwiseAND(lit(858993459L))
    (s4.bitwiseOR(shiftleft(s4, 1))).bitwiseAND(lit(1431655765L))
  }

  /** 32-bit Morton code of two 16-bit keys: x on even bits, y on odd. */
  def zorder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The matching DuckDB expression text (same magic numbers), for
    * oracle SQL generation. */
  def duckZorder2(x: String, y: String): String = {
    def spread(v: String): String = {
      val s1 = s"($v & 65535)"
      val s2 = s"(($s1 | ($s1 << 8)) & 16711935)"
      val s3 = s"(($s2 | ($s2 << 4)) & 252645135)"
      val s4 = s"(($s3 | ($s3 << 2)) & 858993459)"
      s"(($s4 | ($s4 << 1)) & 1431655765)"
    }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }

  /** Hilbert index of (x, y) on a 2^bits x 2^bits grid — the
    * space-filling-curve layout key with strictly better locality than
    * Morton (consecutive indices are always grid-adjacent, so a range of
    * the key is a connected region and min-max pruning boxes are
    * tighter). Classic iterative xy2d (rotate-and-accumulate per bit
    * plane, msb first); pure integer arithmetic, shared by interpreted
    * eval, generated Java, and the DuckDB fold replay below. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the curve keeps connecting
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse mapping (d -> (x, y)) — test/audit surface for the
    * adjacency contract; same rotation algebra run in reverse. */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** `hilbert2(x, y)` as a codegen-participating expression (static
    * kernel call — the CountTokens discipline). */
  case class HilbertIndex(bits: Int,
      left: org.apache.spark.sql.catalyst.expressions.Expression,
      right: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.types.{DataType, LongType}
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      ZOrder.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.operators.ZOrder.xy2d($bits, $a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): HilbertIndex = copy(left = l, right = r)
    override def prettyName: String = "hilbert2"
  }

  def hilbert2(bits: Int, x: Column, y: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(HilbertIndex(bits,
      org.apache.spark.sql.graftbridge.Bridge.expression(x),
      org.apache.spark.sql.graftbridge.Bridge.expression(y)))

  /** DuckDB replay of [[xy2d]] as one staged CTE per bit plane (the
    * XxHashSql.fmixCtes discipline), msb first. `inCte` must expose
    * columns `hx`, `hy` (the bucket coordinates), `hd` (0) plus `keep`;
    * emits `outCte(keep..., hkey)`. Staged CTEs, not a list_reduce fold:
    * DuckDB 1.0's list_reduce mis-evaluates struct accumulators over
    * vectorized (column) inputs — right on literal probes, wrong on
    * ~99% of table rows — so a fold replay would silently diverge. */
  def duckHilbertCtes(bits: Int, inCte: String, outCte: String,
      keep: Seq[String]): String = {
    val k = keep.mkString(", ")
    val stages = (bits - 1 to 0 by -1).map { b =>
      val s = 1L << b
      val prev = if (b == bits - 1) inCte else s"hst${b + 1}"
      val cur = if (b == 0) s"hst0" else s"hst$b"
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)::BIGINT"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)::BIGINT"
      s"""$cur AS (SELECT $k,
         |  CASE WHEN (hy & $s) = 0
         |    THEN (CASE WHEN (hx & $s) > 0 THEN $s - 1 - hy ELSE hy END)
         |    ELSE hx END AS hx,
         |  CASE WHEN (hy & $s) = 0
         |    THEN (CASE WHEN (hx & $s) > 0 THEN $s - 1 - hx ELSE hx END)
         |    ELSE hy END AS hy,
         |  hd + $s * $s * xor(3 * $rx, $ry) AS hd
         |FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""$stages,
       |$outCte AS (SELECT $k, hd AS hkey FROM hst0)""".stripMargin
  }

  /** Cluster a DataFrame by the z-order of two dimension keys:
    * range-partition on the Morton code, sort within partitions — the
    * write-side layout step before persisting to parquet, after which
    * min-max pruning works on BOTH dimensions. */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
      partitions: Int): DataFrame = {
    val keyed = df.withColumn("_zkey", zorder2(x, y))
    keyed.repartitionByRange(partitions, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
  }
}
