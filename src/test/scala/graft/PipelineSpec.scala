package graft

import graft.queries.QaPipeline

class PipelineSpec extends SparkSpec {

  lazy val judged = QaPipeline.judged(spark, sf).collect()

  test("answers cover every non-empty document exactly once") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(judged.length == docs)
    assert(judged.map(_.getAs[Long]("doc_id")).distinct.length == judged.length)
  }

  test("filtering stats are consistent") {
    judged.foreach { r =>
      val before = r.getAs[Long]("chunks_before")
      val after = r.getAs[Long]("chunks_after")
      assert(after <= before && before > 0)
      val rate = r.getAs[Double]("retention_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("error-row fabrication: no survivors => canned answer, else content") {
    judged.foreach { r =>
      val after = r.getAs[Long]("chunks_after")
      val ans = r.getAs[String]("llm_answer")
      if (after == 0) {
        assert(ans == "No answer found in document")
        assert(r.getAs[String]("reduce_input").isEmpty)
        assert(r.getAs[String]("judgment") == "No answer")
      } else {
        assert(ans.nonEmpty && ans != "No answer found in document")
        assert(r.getAs[String]("reduce_input").nonEmpty)
      }
    }
  }

  test("judgments are from the 5-way set, batching is positional") {
    val valid = Set("Correct", "Coherent", "Deviated", "Incorrect", "No answer")
    judged.foreach { r =>
      assert(valid(r.getAs[String]("judgment")))
      val item = r.getAs[Int]("item_number")
      assert(item >= 1 && item <= 5)
    }
    // doc_id order defines batches of 5
    val sorted = judged.sortBy(_.getAs[Long]("doc_id"))
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("batch_id") == i / 5)
      assert(r.getAs[Int]("item_number") == i % 5 + 1)
    }
  }

  test("reduce_input preserves chunk order and only survivors") {
    // reduce_input lines must each contain a question token (score>1 needs
    // >= 2 distinct matches, so every surviving chunk mentions >= 2)
    val qtoks = Set("spark", "query", "join", "data")
    judged.filter(_.getAs[Long]("chunks_after") > 0).take(50).foreach { r =>
      r.getAs[String]("reduce_input").split("\n").foreach { line =>
        assert(qtoks.count(t => line.split(" ").contains(t)) >= 2)
      }
    }
  }
}
