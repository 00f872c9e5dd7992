package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.SimilarityQueries

/** Contracts for the embedding-label audit family: nearest-centroid
  * classification, hard-negative mining, label outliers. Each query also
  * has a full DuckDB oracle (CORRECTNESS gate); these specs pin the
  * independent naive-math parity and the plan shapes. */
class LabelOpsSpec extends SparkSpec {

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    var na = 0.0; var nb = 0.0; i = 0
    while (i < a.length) { na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val vecs: Seq[(Long, Int, Array[Double])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        Similarity.toDoubleArray(col("embedding")).as("dv"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .toSeq

  // naive per-label mean, summed in vec_id order (the ordered_sum fold)
  private lazy val centroids: Map[Int, Array[Double]] =
    vecs.groupBy(_._2).map { case (label, members) =>
      val sorted = members.sortBy(_._1)
      val dim = sorted.head._3.length
      val c = Array.fill(dim)(0.0)
      sorted.foreach { case (_, _, v) =>
        var i = 0; while (i < dim) { c(i) += v(i); i += 1 } }
      label -> c.map(_ / sorted.size)
    }

  test("nearest-centroid confusion matrix matches the naive argmax") {
    val got = SimilarityQueries.nearestCentroid(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expected = vecs
      .map { case (_, label, v) =>
        val pred = centroids.toSeq
          .map { case (cl, cv) => (-cos(v, cv), cl) }.min._2
        (label, pred)
      }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    assert(got == expected)
  }

  test("nearest-centroid assignment plan is a single-scan projection (no join)") {
    val plan = SimilarityQueries.nearestCentroid(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one corpus scan in:\n$plan")
  }

  test("hard negatives: never same-label, and exactly the naive filtered top-k") {
    val got = SimilarityQueries.hardNegatives(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val byId = vecs.map(v => v._1 -> v).toMap
    val expected = vecs.filter(_._1 < 10).flatMap { case (qid, ql, qv) =>
      vecs.filter(c => c._2 != ql)
        .map { case (cid, _, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, _), i) => (qid, cid, i + 1) }
    }.toSet
    assert(got == expected)
    got.foreach { case (qid, cid, _) =>
      assert(byId(qid)._2 != byId(cid)._2, s"same-label pair ($qid,$cid)")
    }
  }

  test("label outliers: a singleton label (sigma 0) is excluded, not NULL-dropped") {
    val sess = SparkSpec.spark; import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lo").toString
    val rnd = new scala.util.Random(5)
    val rows =
      // label 1: 30 spread-out vectors (real sigma, some outliers) ...
      (0 until 30).map { i =>
        (i.toLong, Array.fill(4)(rnd.nextFloat()
          * (if (i == 0) 10f else 1f)), 1)
      } :+
      // ... label 99: ONE vector — sigma is exactly 0
      ((99L, Array.fill(4)(1.0f), 99))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SimilarityQueries.labelOutliers(spark, dir).collect()
    assert(got.forall(_.getInt(1) != 99),
      "the sigma=0 singleton label must not emit an outlier row")
    assert(got.forall(!_.isNullAt(3)), "no NULL z may survive")
    assert(got.nonEmpty, "the planted far-out vector should be flagged")
  }

  test("label outliers: z matches the naive two-pass stats; selection is exact") {
    val dists = SimilarityQueries.centroidDist(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val stats = dists.groupBy(_._2).map { case (label, g) =>
      val sorted = g.sortBy(_._1)
      val mu = sorted.foldLeft(0.0)(_ + _._3) / g.size
      val sigma = math.sqrt(
        sorted.foldLeft(0.0)((a, d) => a + (d._3 - mu) * (d._3 - mu)) / g.size)
      label -> ((mu, sigma))
    }
    val expected = dists.flatMap { case (vid, label, d) =>
      val (mu, sigma) = stats(label)
      val z = BigDecimal((d - mu) / sigma)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (z >= 2.0) Some((vid, label, d, z)) else None
    }.toSet
    val got = SimilarityQueries.labelOutliers(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty || expected.isEmpty)
  }
}
