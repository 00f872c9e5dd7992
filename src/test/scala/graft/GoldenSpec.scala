package graft

import java.nio.file.{Files, Paths}

/** SURVEY §5 plan item 4: end-to-end golden test — the fixture corpus run
  * through the full deterministic engine, compared byte-for-byte against
  * a checked-in golden (canonical form: one JSON object per row, schema
  * field order, rows sorted by doc_id — no clock, no randomness, so the
  * output is stable across machines and Spark versions that preserve the
  * engine's semantics). */
class GoldenSpec extends SparkSpec {

  private def resource(rel: String): String = {
    val url = getClass.getResource(rel)
    assert(url != null, s"missing test resource $rel")
    Paths.get(url.toURI).toString
  }

  private def canonical(): String = {
    val corpus = graft.sources.QaSources.markdownCorpus(
      spark, resource("/fixtures/golden_corpus"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val out = Engine(
      question = "spark query join data filter group sort merge window stream batch hash")
      .judged(corpus)
    out.toJSON.collect().sorted.mkString("\n") + "\n"
  }

  test("end-to-end run matches the checked-in golden byte for byte") {
    val got = canonical()
    val goldenPath = "src/test/resources/golden/qa_judged.jsonl"
    if (!Files.exists(Paths.get(goldenPath))) {
      Files.createDirectories(Paths.get(goldenPath).getParent)
      Files.writeString(Paths.get(goldenPath), got)
      fail(s"golden was missing — wrote $goldenPath; rerun to verify")
    }
    val want = Files.readString(Paths.get(goldenPath))
    assert(got == want,
      "engine output diverged from the checked-in golden:\n" +
        got.linesIterator.zip(want.linesIterator).filter(p => p._1 != p._2)
          .take(3).map(p => s"  got:  ${p._1}\n  want: ${p._2}").mkString("\n"))
  }
}
