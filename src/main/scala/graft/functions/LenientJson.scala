package graft.functions

import com.fasterxml.jackson.core.json.JsonReadFeature
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lenient_json(text)` — multi-strategy JSON extraction (M2; reference
  * fallback chain at src/llm/async_llm_client.py:144-195):
  *
  *   1. the whole (trimmed) string, parsed leniently (json5-grade:
  *      single quotes, unquoted field names, trailing commas — the
  *      reference leans on `json5` at :164);
  *   2. the content of a ```json fenced block;
  *   3. the largest balanced `{...}` substring (string-aware scan),
  *      longest candidates first.
  *
  * The fallback ORDER is observable behavior and matches the reference.
  * On success returns the canonical strict re-serialization (so a
  * downstream `from_json` always parses); null if nothing parses.
  */
case class LenientJsonExtract(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import LenientJsonExtract._
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String].toString
    val out = extract(raw)
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildInternal(c: Expression): LenientJsonExtract =
    copy(c)
  override def prettyName: String = "lenient_json"
}

object LenientJsonExtract {
  // lenient Jackson: json5-grade tolerance
  @transient private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    Seq(JsonReadFeature.ALLOW_SINGLE_QUOTES,
      JsonReadFeature.ALLOW_UNQUOTED_FIELD_NAMES,
      JsonReadFeature.ALLOW_TRAILING_COMMA,
      JsonReadFeature.ALLOW_JAVA_COMMENTS)
      .foreach(f => m.configure(f.mappedFeature(), true))
    m
  }

  private def tryParse(s: String): Option[JsonNode] =
    try {
      val n = mapper.readTree(s)
      if (n != null && (n.isObject || n.isArray)) Some(n) else None
    } catch { case _: Exception => None }

  private val fence = "(?s)```(?:json)?\\s*(.*?)```".r

  /** All balanced top-level {...} spans, longest first. String-aware for
    * BOTH quote styles — the lenient parser accepts single-quoted (json5)
    * strings, so a '}' inside '...' must not close a brace either. */
  private def braceCandidates(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '{') {
        var depth = 0
        var j = i
        var quote: Char = 0 // 0 = not in string; otherwise the open quote
        var esc = false
        var end = -1
        while (j < s.length && end < 0) {
          val c = s.charAt(j)
          if (quote != 0) {
            if (esc) esc = false
            else if (c == '\\') esc = true
            else if (c == quote) quote = 0
          } else c match {
            case '"' | '\'' => quote = c
            case '{' => depth += 1
            case '}' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end > i) { out += s.substring(i, end + 1); i = end + 1 }
        else i += 1
      } else i += 1
    }
    out.sortBy(-_.length).toSeq
  }

  def extract(raw: String): String = {
    val candidates =
      Iterator(raw.trim) ++
        fence.findAllMatchIn(raw).map(_.group(1).trim) ++
        braceCandidates(raw).iterator
    candidates
      .flatMap(c => tryParse(c))
      .map(n => mapper.writeValueAsString(n))
      .nextOption()
      .orNull
  }

  def lenient_json(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      LenientJsonExtract(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
