package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** QA dataset sources (SURVEY.md §2.1, S1/S2/S3/S6/S7/S14): explicit
  * schemas + the reference loaders' projections, as distributed scans.
  * The reference's schema-on-read dicts become declared StructTypes;
  * missing keys become nullable columns with the reference's defaults.
  */
object QaSources {

  /** Raw FinanceBench JSONL shape (nested evidence objects) —
    * reference: src/loaders/financebench_loader.py:26-52. */
  val financeBenchRawSchema: StructType = StructType(Seq(
    StructField("doc_name", StringType),
    StructField("question", StringType),
    StructField("answer", StringType),
    StructField("justification", StringType),
    StructField("evidence", ArrayType(StructType(Seq(
      StructField("evidence_text", StringType))))),
    StructField("question_type", StringType),
    StructField("question_reasoning", StringType)))

  /** S1 + P1: JSONL scan with the loader's projection — evidence
    * flattened to array<string>, justification null-filled. */
  def financeBench(spark: SparkSession, path: String,
      limit: Option[Int] = None): DataFrame = {
    val df = spark.read.schema(financeBenchRawSchema).json(path)
      .select(
        col("doc_name"), col("question"), col("answer"),
        coalesce(col("justification"), lit("No justification provided"))
          .as("justification"),
        coalesce(transform(col("evidence"), e => e("evidence_text")),
          array().cast("array<string>")).as("evidence"),
        col("question_type"), col("question_reasoning"))
    limit.fold(df)(df.limit) // P3: sample limit
  }

  private val finqaRawSchema = StructType(Seq(
    StructField("doc_name", StringType),
    StructField("question", StringType),
    StructField("answer", StringType),
    StructField("filename", StringType),
    StructField("explanation", StringType)))

  /** S2 + P2: FinQA single-array JSON scan with "" defaults —
    * reference: src/loaders/finqa_loader.py:27-50. Explicit schema (the
    * financeBench discipline): with inference, an optional key present
    * in NO record yields a frame without that column and the default
    * projection fails resolution instead of defaulting. */
  def finqa(spark: SparkSession, path: String,
      limit: Option[Int] = None): DataFrame = {
    val df = spark.read.option("multiLine", true)
      .schema(finqaRawSchema).json(path)
      .select(
        col("doc_name"), col("question"), col("answer"),
        coalesce(col("filename"), lit("")).as("filename"),
        coalesce(col("explanation"), lit("")).as("explanation"))
    limit.fold(df)(df.limit)
  }

  private val judgmentsRawSchema = StructType(Seq(
    StructField("model_answer", StringType),
    StructField("gold_answer", StringType),
    StructField("question", StringType),
    StructField("label", StringType)))

  /** S14 + P8: labeled judge meta-evaluation samples — keep only rows with
    * all four required fields (scripts/llm_judge_evaluation.py:22-41).
    * Explicit schema: an all-rows-missing key must surface as null rows
    * filtered here, not an unresolved-column error. */
  def labeledJudgments(spark: SparkSession, glob: String): DataFrame =
    spark.read.schema(judgmentsRawSchema).json(glob)
      .filter(col("model_answer").isNotNull && col("gold_answer").isNotNull &&
        col("question").isNotNull && col("label").isNotNull)
      .select(col("model_answer"), col("gold_answer"), col("question"), col("label"))

  /** S3: markdown corpus scan — whole-file documents, doc_id from the file
    * name (reference: document_processing.py:344-371). */
  def markdownCorpus(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("text").option("wholetext", "true")
      .load(s"$dir/*.md")
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.md$", 1).as("doc_id"),
        col("value").as("text"),
        input_file_name().as("source"))

  /** S7: doc-name path resolution against search dirs + extensions
    * (driver-side catalog; reference: document_processing.py:26-100). */
  def resolveDocPath(name: String, searchDirs: Seq[String],
      extensions: Seq[String] = Seq(".md", ".markdown", ".pdf")): Option[String] = {
    val candidates =
      for (dir <- searchDirs.iterator; base <- Iterator(name);
           cand <- Iterator(base) ++ extensions.iterator.map(base + _))
        yield Paths.get(dir, cand)
    candidates.find(Files.exists(_)).map(_.toString)
  }

  /** Catalog form of S7: (doc_name -> path) table to join against scans. */
  def docCatalog(spark: SparkSession, names: Seq[String],
      searchDirs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    val rows = names.map(n =>
      Row(n, resolveDocPath(n, searchDirs).orNull))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("doc_name", StringType),
        StructField("path", StringType))))
  }
}
