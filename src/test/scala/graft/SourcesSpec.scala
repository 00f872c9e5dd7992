package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.LenientJsonExtract
import graft.sources.{ChunkCache, QaSources, ResultsSink}

class SourcesSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_fixtures").toString
    // FinanceBench JSONL (S1 shape, incl. null justification)
    Files.writeString(java.nio.file.Paths.get(dir, "fb.jsonl"),
      """{"doc_name":"APPLE_2022_10K","question":"Total net sales?","answer":"$394.3 billion","justification":"Income statement","evidence":[{"evidence_text":"Total net sales $394,328"}],"question_type":"metrics-generated","question_reasoning":"Information extraction"}
        |{"doc_name":"MSFT_2022_10K","question":"Operating income?","answer":"$83.4 billion","justification":null,"evidence":[{"evidence_text":"Operating income was $83,383"},{"evidence_text":"segment detail"}],"question_type":"domain-relevant","question_reasoning":null}
        |""".stripMargin)
    // FinQA array JSON (S2 shape, missing optional fields)
    Files.writeString(java.nio.file.Paths.get(dir, "finqa.json"),
      """[{"doc_name":"AAPL_2022.md","question":"Pct change?","answer":"7.8%","filename":"AAPL/2022/page_42.pdf","explanation":"subtract(394328, 365817)"},
        |{"doc_name":"MSFT_2022.md","question":"Margin?","answer":"42%"}]""".stripMargin)
    // labeled judgments (S14)
    Files.writeString(java.nio.file.Paths.get(dir, "labeled.jsonl"),
      """{"model_answer":"yes","gold_answer":"yes","question":"q1","label":"Correct Answer"}
        |{"model_answer":"no","gold_answer":"yes","question":"q2","label":"Incorrect Answer"}
        |{"model_answer":"partial","gold_answer":"yes","question":"q3"}
        |""".stripMargin)
    // markdown corpus (S3)
    Files.writeString(java.nio.file.Paths.get(dir, "APPLE_2022.md"),
      "# Apple 10-K\nTotal net sales were $394,328 million in fiscal 2022.")
    Files.writeString(java.nio.file.Paths.get(dir, "MSFT_2022.md"),
      "# Microsoft 10-K\nOperating income was $83,383 million.")
    dir
  }

  test("financeBench scan: projection, evidence flatten, null fill") {
    val df = QaSources.financeBench(spark, s"$fixtureDir/fb.jsonl")
    val rows = df.orderBy("doc_name").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("justification") == "Income statement")
    assert(rows(1).getAs[String]("justification") == "No justification provided")
    assert(rows(1).getSeq[String](rows(1).fieldIndex("evidence")) ==
      Seq("Operating income was $83,383", "segment detail"))
    assert(QaSources.financeBench(spark, s"$fixtureDir/fb.jsonl", Some(1)).count() == 1)
  }

  test("finqa scan: array file, empty-string defaults") {
    val rows = QaSources.finqa(spark, s"$fixtureDir/finqa.json")
      .orderBy("doc_name").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("filename") == "AAPL/2022/page_42.pdf")
    assert(rows(1).getAs[String]("filename") == "")
    assert(rows(1).getAs[String]("explanation") == "")
  }

  test("labeled judgments scan keeps only complete rows") {
    val df = QaSources.labeledJudgments(spark, s"$fixtureDir/labeled.jsonl")
    assert(df.count() == 2) // the row missing `label` is dropped
  }

  test("markdown corpus scan: one row per file, doc_id from filename") {
    val rows = QaSources.markdownCorpus(spark, fixtureDir)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getAs[String]("doc_id")).toSeq == Seq("APPLE_2022", "MSFT_2022"))
    assert(rows(0).getAs[String]("text").contains("394,328"))
  }

  test("doc path resolution: S7 search-dir + extension rules") {
    assert(QaSources.resolveDocPath("APPLE_2022", Seq(fixtureDir)).isDefined)
    assert(QaSources.resolveDocPath("APPLE_2022", Seq(fixtureDir)).get.endsWith(".md"))
    assert(QaSources.resolveDocPath("NOPE_2022", Seq(fixtureDir)).isEmpty)
    val cat = QaSources.docCatalog(spark, Seq("APPLE_2022", "NOPE"), Seq(fixtureDir))
    assert(cat.filter(col("path").isNull).count() == 1)
  }

  test("lenient json: fallback chain order and json5 tolerance") {
    def x(s: String): String = LenientJsonExtract.extract(s)
    // 1. strict whole-string
    assert(x("""{"a": 1}""") == """{"a":1}""")
    // json5-grade: single quotes, unquoted names, trailing comma
    assert(x("""{'a': 1, b: 2,}""") == """{"a":1,"b":2}""")
    // 2. fenced block wins over later braces
    assert(x("noise ```json\n{\"a\": 1}\n``` tail {\"b\": 2}") == """{"a":1}""")
    // 3. largest balanced brace match
    assert(x("""garbage {"a": {"nested": 1}} trailing""") == """{"a":{"nested":1}}""")
    // brace inside string doesn't break the scan
    assert(x("""x {"a": "}{", "b": 1} y""") == """{"a":"}{","b":1}""")
    // nothing parseable
    assert(x("no json here at all") == null)
  }

  test("chunk cache: read-through, hit, invalidate") {
    val root = Files.createTempDirectory("graft_cache").toString
    val cache = new ChunkCache(spark, root)
    val k = cache.key("doc1.md", "markdown", 64, 16)
    assert(!cache.contains(k))
    var computes = 0
    def produce = {
      computes += 1
      spark.range(5).select(col("id").as("chunk_idx"))
    }
    assert(cache.readThrough(k)(produce).count() == 5)
    assert(computes == 1)
    assert(cache.readThrough(k)(produce).count() == 5)
    assert(computes == 1) // hit: no recompute
    // different params -> different key -> recompute
    val k2 = cache.key("doc1.md", "markdown", 32, 8)
    assert(k2 != k)
    cache.invalidate(k)
    assert(!cache.contains(k))
    assert(cache.readThrough(k)(produce).count() == 5)
    assert(computes == 2)
  }

  test("results sink writes qa_data + envelope") {
    val root = Files.createTempDirectory("graft_results").toString
    val answers = graft.queries.QaPipeline.mapreduceAnswers(spark, sf).limit(10)
    val runDir = ResultsSink.write(answers, root,
      Map("format" -> "hybrid", "chunk_size" -> "64"), "2026-01-01T00-00-00")
    val back = spark.read.json(s"$runDir/qa_data")
    assert(back.count() == 10)
    val env = spark.read.json(s"$runDir/envelope").collect()(0)
    assert(env.getAs[String]("config_format") == "hybrid")
    assert(env.getAs[String]("timestamp") == "2026-01-01T00-00-00")
  }
}
