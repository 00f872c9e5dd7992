package graft

import org.apache.spark.sql.functions._

/** Edge-case contracts for [[graft.operators.Similarity.blockedMoments]]
  * — the imperative per-partition moment kernel behind
  * sim_covariance / sim_pca_proj. The oracle gate exercises the happy
  * path at both SFs; these pin the boundaries a gate corpus never hits:
  * a block-size-multiple corpus, a single-block corpus, sparse vec_ids
  * (blocks keyed on id VALUE, not row index), input-partitioning
  * independence, and bit-exactness of the two-level fold against a
  * driver-side recomputation. */
class BlockedMomentsSpec extends SparkSpec {

  private def naive(vecs: Seq[(Long, Array[Float])], block: Long)
      : (Map[(Int, Int), Double], Map[Int, Double]) = {
    // two-level fold: vec_id order within blk, blk order across —
    // exactly the contract the kernel + ordered_sum(s, blk) implement
    val d = vecs.head._2.length
    val byBlk = vecs.groupBy(_._1 / block).toSeq.sortBy(_._1)
    def fold(xs: Seq[Double]): Double = xs.foldLeft(0.0)(_ + _)
    val sij = (for { i <- 1 to d; j <- i to d } yield {
      (i, j) -> fold(byBlk.map { case (_, vs) =>
        fold(vs.sortBy(_._1).map(v =>
          v._2(i - 1).toDouble * v._2(j - 1).toDouble))
      })
    }).toMap
    val si = (1 to d).map { i =>
      i -> fold(byBlk.map { case (_, vs) =>
        fold(vs.sortBy(_._1).map(_._2(i - 1).toDouble))
      })
    }.toMap
    (sij, si)
  }

  private def engine(vecs: Seq[(Long, Array[Float])], block: Long,
      parts: Int): (Map[(Int, Int), Double], Map[Int, Double]) = {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding").repartition(parts)
    val m = graft.operators.Similarity.blockedMoments(df, block)
    val sij = m.filter(col("j") >= 1)
      .groupBy(col("i"), col("j"))
      .agg(graft.functions.TextFunctions.ordered_sum(
        col("s"), col("blk")).as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val si = m.filter(col("j") === 0)
      .groupBy(col("i"))
      .agg(graft.functions.TextFunctions.ordered_sum(
        col("s"), col("blk")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (sij, si)
  }

  private def mk(ids: Seq[Long], d: Int): Seq[(Long, Array[Float])] =
    ids.map(id => id -> Array.tabulate(d)(k =>
      (((id * 31 + k * 7) % 13) - 6).toFloat / 4.0f))

  test("single block (n < block): moments bit-equal the driver fold") {
    val vs = mk(0L until 5L, 3)
    assert(engine(vs, 256L, 3) == naive(vs, 256L))
  }

  test("n exactly a multiple of the block size: last block is full") {
    val vs = mk(0L until 8L, 4)
    val (esij, esi) = engine(vs, 4L, 2)
    assert((esij, esi) == naive(vs, 4L))
    // really multi-block: cell (1,1) partials came from 2 blocks
    val s2 = spark
    val nBlk = graft.operators.Similarity
      .blockedMoments(
        { import s2.implicits._; vs.toDF("vec_id", "embedding") }, 4L)
      .select(col("blk")).distinct().count()
    assert(nBlk == 2L, s"expected 2 blocks, got $nBlk")
  }

  test("sparse vec_ids: blocks key on id value, empty blocks don't exist") {
    // ids straddle blocks 0, 2 and 7 of size 4; blocks 1,3..6 are empty
    val vs = mk(Seq(1L, 3L, 9L, 11L, 30L), 3)
    val (esij, esi) = engine(vs, 4L, 2)
    assert((esij, esi) == naive(vs, 4L))
  }

  test("input partitioning does not change a single bit") {
    val vs = mk(0L until 37L, 5)
    val one = engine(vs, 8L, 1)
    assert(engine(vs, 8L, 7) == one)
    assert(engine(vs, 8L, 16) == one)
  }

  test("ragged embedding dimension fails loudly, not silently") {
    val s = spark; import s.implicits._
    val bad = Seq(0L -> Array(1.0f, 2.0f), 1L -> Array(1.0f, 2.0f, 3.0f))
      .toDF("vec_id", "embedding")
    val ex = intercept[org.apache.spark.SparkException] {
      graft.operators.Similarity.blockedMoments(bad, 256L).count()
    }
    assert(ex.getMessage.contains("ragged") ||
      Option(ex.getCause).exists(_.getMessage.contains("ragged")))
  }
}
