package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Source-format agnosticism: the engine's dataflows bind to DataFrames,
  * not files, so any Spark source (parquet, ORC, CSV, JSON lines) feeds
  * the same graph with identical results. This pins that contract by
  * running the token kernel over the same corpus served from four
  * formats. */
class FormatSpec extends SparkSpec {

  private def tokenStats(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), TextFunctions.count_tokens(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("parquet, ORC, CSV and JSON sources produce identical results") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    base.write.mode("overwrite").orc(s"$dir/orc")
    base.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"").csv(s"$dir/csv")
    base.write.mode("overwrite").json(s"$dir/json")

    val expected = tokenStats(base)
    val orc = tokenStats(spark.read.orc(s"$dir/orc"))
    val csv = tokenStats(spark.read
      .option("header", "true").option("escape", "\"")
      // multiLine: quoted embedded newlines must not split records
      .option("multiLine", "true")
      .option("inferSchema", "true").csv(s"$dir/csv")
      .select(col("doc_id").cast("long").as("doc_id"), col("text")))
    val json = tokenStats(spark.read.json(s"$dir/json")
      .select(col("doc_id").cast("long").as("doc_id"), col("text")))

    assert(orc == expected, "ORC round-trip diverged")
    assert(csv == expected, "CSV round-trip diverged")
    assert(json == expected, "JSON round-trip diverged")
  }
}
