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
