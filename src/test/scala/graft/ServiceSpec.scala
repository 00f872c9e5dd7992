package graft

/** §3.3: single-request service facade — upload-shaped input, pipeline
  * cache behavior, and the N=1 latency posture. */
class ServiceSpec extends SparkSpec {

  private val doc =
    ("spark query join data across tables with window functions " +
      "and stream batch merge sort hash aggregation ") * 40

  test("ask answers a parsed upload end to end (mapreduce and truncation)") {
    val svc = new QaService(spark)
    val q = "spark query join data"
    val a = svc.ask("report.md", doc.getBytes("UTF-8"), q)
    assert(a.answer.nonEmpty && a.answer != "No answer found in document")
    assert(a.score > 0 && a.chunksAfter > 0)
    assert(Set("Correct", "Coherent", "Deviated", "Incorrect", "No answer")(a.judgment))
    val t = svc.ask("report.md", doc.getBytes("UTF-8"), q,
      pipelineType = "truncation")
    assert(t.answer.nonEmpty)
    assert(t.retentionRate > 0)
    // unparseable upload fails like the endpoint's 400 path
    intercept[IllegalArgumentException](
      svc.ask("bad.pdf", Array[Byte](1, 2, 3), q))
    intercept[IllegalArgumentException](
      svc.ask("report.md", doc.getBytes("UTF-8"), q, promptSet = "nope"))
  }

  test("preview returns the parsed head without running the pipeline") {
    val svc = new QaService(spark)
    val p = svc.preview("report.md", doc.getBytes("UTF-8"))
    assert(p.filename == "report.md" && p.fileType == ".md")
    assert(p.fileSize == doc.getBytes("UTF-8").length.toLong)
    assert(p.fullLength == doc.length.toLong)
    assert(p.isTruncated && p.previewText.length > 2000) // head + marker
    assert(p.previewText.startsWith(doc.substring(0, 100)))
    assert(p.previewText.endsWith("... (content truncated for preview)"))
    // estimate follows the engine's ceil(count * 1.15) rule
    val n = graft.functions.Tokenizer.countTokens(doc)
    assert(p.estimatedTokens == math.ceil(n * 1.15).toLong)
    // short docs come back whole, unmarked
    val s = svc.preview("tiny.md", "short text".getBytes("UTF-8"))
    assert(!s.isTruncated && s.previewText == "short text")
    // unparseable upload fails like the endpoint's 400 path
    intercept[IllegalArgumentException](
      svc.preview("bad.pdf", Array[Byte](1, 2, 3)))
  }

  test("models/health capability surface derives from the live registries") {
    val svc = new QaService(spark)
    val caps = svc.models
    assert(caps.models == Seq("ExtractiveModel"))
    assert(caps.pipelineTypes == Engine.supportedPipelines)
    assert(caps.formatTypes == Engine.supportedFormats)
    // the reference-canonical name is advertised, and every advertised
    // format is accepted by the Engine dispatch
    assert(caps.formatTypes.contains("plain_text"))
    caps.formatTypes.foreach(f => Engine(format = f))
    assert(caps.truncationStrategies.toSet == Set("start", "end", "smart"))
    assert(caps.pdfParsers.contains("marker") && caps.pdfParsers.contains("markdown"))
    // every advertised prompt set actually resolves
    caps.promptSets.foreach(n => graft.sources.Prompts.resolve(Some(n)))
    assert(caps.promptSets.contains("hybrid"))
    val h = svc.health
    assert(h.status == "healthy" && h.version.nonEmpty)
    assert(java.time.Instant.parse(h.timestamp) != null) // ISO-8601
  }

  test("engine cache: same config reuses the instance, distinct configs don't") {
    val svc = new QaService(spark)
    val e1 = svc.engineFor("q one", "hybrid", 64, 16, 1)
    val e2 = svc.engineFor("q one", "hybrid", 64, 16, 1)
    val e3 = svc.engineFor("q one", "json", 64, 16, 1)
    assert(e1 eq e2)
    assert(!(e1 eq e3))
    assert(svc.cacheSize == 2)
  }

  test("RunPipeline CLI entry: markdown corpus -> results envelope end to end") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_cli").toString
    Files.writeString(java.nio.file.Paths.get(dir, "a.md"),
      "spark query join data across tables " * 30)
    Files.writeString(java.nio.file.Paths.get(dir, "b.md"),
      "unrelated prose about gardening and weather " * 30)
    val out = Files.createTempDirectory("graft_cli_out").toString
    val cfg = RunPipeline.parse(Array(
      "--dataset", "markdown", "--path", dir, "--approach", "mapreduce",
      "--format", "hybrid", "--prompt-set", "hybrid",
      "--question", "spark query join data", "--out", out))
    val runDir = RunPipeline.run(spark, cfg, "test_ts")
    val qa = spark.read.json(s"$runDir/qa_data")
    assert(qa.count() == 2)
    assert(qa.columns.contains("judgment") && qa.columns.contains("llm_answer"))
    val env = spark.read.json(s"$runDir/envelope")
    assert(env.count() == 1)
    // the serialized prompt set survives the envelope round-trip (S12)
    val promptsJson = env.select("config_prompts_json").first().getString(0)
    assert(graft.sources.Prompts.fromJson(promptsJson) ==
      graft.sources.Prompts.resolve(Some("hybrid")))
    // bad args fail fast
    intercept[IllegalArgumentException](RunPipeline.parse(Array("--nope", "x")))
    intercept[IllegalArgumentException](
      RunPipeline.run(spark, cfg.copy(dataset = "nope"), "t"))
  }

  test("warm single-request latency stays interactive") {
    val svc = new QaService(spark)
    val q = "spark query join data"
    svc.ask("warm.md", doc.getBytes("UTF-8"), q) // codegen + cache warmup
    val t0 = System.nanoTime()
    val reps = 3
    (1 to reps).foreach(_ => svc.ask("warm.md", doc.getBytes("UTF-8"), q))
    val avgSec = (System.nanoTime() - t0) / 1e9 / reps
    info(f"warm single-request latency: $avgSec%.3f s avg of $reps")
    // N=1 on a warm session must be interactive (reference answers one
    // upload per request, SURVEY 3.3); measured 0.42 s avg on the local[4]
    // test session (PERF_NOTES r11) - the 1 s bound leaves CI headroom
    assert(avgSec < 1.0, f"warm single-request latency $avgSec%.2f s")
  }
}
