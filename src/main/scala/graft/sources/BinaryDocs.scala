package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4/S5: binary document ingestion seam.
  *
  * The reference is a PDF-QA tool: raw files are parsed to markdown by a
  * per-method parser (marker CLI at document_processing.py:194-243, the
  * pypdf/pymu/unstructured/pdfminer loader dispatch at :374-411), then the
  * markdown flows into the S3 corpus path. This module is the in-engine
  * equivalent: a `binaryFile` scan (path, length, bytes), a pluggable
  * [[DocumentParser]] slot, and a projection into the exact S3 corpus
  * shape (doc_id, text, source) that every downstream operator consumes.
  *
  * Scale posture: the scan parallelizes per file; parsing is a partition-
  * local projection (no shuffle); unparseable files are dropped like the
  * reference's `return None` paths, with a count surfaced via
  * `Dataset.observe` rather than silently.
  *
  * The PDF text extraction itself is honestly stubbed ([[PdfStubParser]]):
  * the marker CLI / pdfminer toolchain is out-of-band in this environment
  * (SURVEY.md §5 scope), so the stub does a deterministic best-effort
  * extraction that is real enough to test the plumbing end to end.
  */
trait DocumentParser extends Serializable {
  /** Reference method name this slot mirrors (factory dispatch key). */
  def method: String
  /** Raw file bytes -> markdown/plain text; None = unparseable (the row
    * is dropped, as in the reference's parse-failure path). */
  def parse(path: String, content: Array[Byte]): Option[String]
}

/** Markdown / plain text passthrough: the bytes already ARE the document
  * (reference: the financebench pre-parsed markdown shortcut,
  * document_processing.py:196-203). */
object MarkdownPassthrough extends DocumentParser {
  val method = "markdown"
  def parse(path: String, content: Array[Byte]): Option[String] =
    Some(new String(content, UTF_8))
}

/** PDF parser slot for the marker/pypdf/pymu/unstructured/pdfminer methods
  * (document_processing.py:400-411). The real toolchains are external
  * CLIs/libraries unavailable here, so extraction is a deterministic
  * stand-in: printable runs inside the PDF byte stream (works on
  * uncompressed text objects; garbage-free on anything else). The seam —
  * bytes in, markdown out, failure = None — is the contract a real
  * implementation drops into. */
case class PdfStubParser(method: String = "default") extends DocumentParser {
  def parse(path: String, content: Array[Byte]): Option[String] = {
    if (content.length < 5 ||
        new String(content.take(5), UTF_8) != "%PDF-") return None
    val sb = new StringBuilder
    var run = new StringBuilder
    content.foreach { b =>
      val c = b.toChar
      if (c >= ' ' && c <= '~') run.append(c)
      else {
        if (run.length >= 4) { sb.append(run).append('\n') }
        run = new StringBuilder
      }
    }
    if (run.length >= 4) sb.append(run).append('\n')
    Some(sb.toString)
  }
}

object BinaryDocs {

  /** The reference's method registry (factory dispatch,
    * document_processing.py:400-411): every PDF method is the stub slot
    * until a real parser is plugged in; markdown passes through. */
  val defaultParsers: Map[String, DocumentParser] = Map(
    "markdown" -> MarkdownPassthrough,
    "marker" -> PdfStubParser("marker"),
    "pypdf" -> PdfStubParser("pypdf"),
    "pymu" -> PdfStubParser("pymu"),
    "unstructured" -> PdfStubParser("unstructured"),
    "default" -> PdfStubParser("default"))

  /** Extension -> method, mirroring _load_document's suffix dispatch. */
  def methodForPath(path: String): String =
    if (path.endsWith(".md") || path.endsWith(".markdown")) "markdown"
    else "default"

  /** S4 raw scan: one row per file (path, modificationTime, length,
    * content binary). Parallel per file; no parsing yet. */
  def scan(spark: SparkSession, dir: String,
      glob: String = "*.{md,markdown,pdf}"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Binary scan -> parser slot -> S3 corpus shape (doc_id, text, source).
    * Equivalent rows to [[QaSources.markdownCorpus]] for .md inputs; PDFs
    * flow through their method's parser. Unparseable files are dropped
    * with an observed count (never silent). */
  def parsedCorpus(spark: SparkSession, dir: String,
      parsers: Map[String, DocumentParser] = defaultParsers,
      glob: String = "*.{md,markdown,pdf}"): DataFrame = {
    val parseUdf = udf { (path: String, content: Array[Byte]) =>
      parsers.get(methodForPath(path)).flatMap(_.parse(path, content)).orNull
    }
    scan(spark, dir, glob)
      .select(col("path"),
        regexp_extract(col("path"), "([^/]+)\\.[A-Za-z]+$", 1).as("doc_id"),
        parseUdf(col("path"), col("content")).as("text"))
      .observe("binary_docs",
        sum(when(col("text").isNull, 1).otherwise(0)).as("unparseable_files"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("path").as("source"))
  }
}
