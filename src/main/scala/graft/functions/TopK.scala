package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** `top_k_structs(struct, k)` — bounded top-k aggregate.
  *
  * Keeps the k LARGEST input structs (lexicographic struct order — put
  * the ordering keys first, payload after) in a size-k heap, and returns
  * them as a descending array. With `asc = true` the comparisons flip:
  * the k SMALLEST structs are kept and returned ascending (the
  * `bottom_k_structs` form) — same bounded-state contract either way.
  *
  * This is the scale-correct final stage for ANN/top-k queries: the
  * window formulation (`row_number over (partition by query order by
  * sim)`) shuffles and sorts EVERY scored candidate; this aggregate's
  * partial step caps state at k rows per (group, partition), so only
  * k * partitions rows per group cross the shuffle and nothing is ever
  * fully sorted. A TypedImperativeAggregate, the same machinery as
  * Spark's own percentile/collect aggregates.
  */
case class TopKStructs(
    child: Expression,
    kExpr: Expression,
    asc: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  private lazy val k: Int = {
    val v = kExpr.eval(null)
    require(v != null && v.asInstanceOf[Int] > 0, "top_k_structs: k must be a positive literal")
    v.asInstanceOf[Int]
  }
  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  // "largest by this ordering" is what the heap keeps; flipping it turns
  // the aggregate into bottom-k with zero changes to the heap logic
  private lazy val ordering: Ordering[InternalRow] = {
    val base = TypeUtils.getInterpretedOrdering(child.dataType)
      .asInstanceOf[Ordering[InternalRow]]
    if (asc) base.reverse else base
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  // min-heap of the k largest: head = current smallest kept
  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.max(k, 1),
      (a: InternalRow, b: InternalRow) => ordering.compare(a, b))

  override def update(buf: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow].copy()
      if (buf.size < k) buf.add(row)
      else if (ordering.compare(row, buf.peek()) > 0) { buf.poll(); buf.add(row) }
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[InternalRow],
      b2: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    b2.forEach { row =>
      if (b1.size < k) b1.add(row)
      else if (ordering.compare(row, b1.peek()) > 0) { b1.poll(); b1.add(row) }
    }
    b1
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray(new Array[InternalRow](buf.size))
    java.util.Arrays.sort(arr, (a: InternalRow, b: InternalRow) =>
      ordering.compare(b, a)) // descending
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    val proj = UnsafeProjection.create(structType)
    dos.writeInt(buf.size)
    buf.forEach { row =>
      val bytes = proj(row).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val rowBytes = new Array[Byte](len)
      dis.readFully(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKStructs = copy(cs(0), cs(1))
  override def prettyName: String = "top_k_structs"
}
