package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S11/S12/S13: prompt-set registry, serialization round-trip, and the
  * prompt debug log sink.
  *
  * Reference shape: `config/prompts/prompt_config.yml` names six prompt
  * sets (default/baseline/standard/hybrid/direct/finqa), each mapping
  * stage -> template file with `{variable}` placeholders; the factory
  * resolves a set by name with a default fallback (factory.py:92-101);
  * pipelines serialize their prompts into the results JSON and can
  * reconstruct them from it (base_pipeline.py:634-703); the async client
  * logs each outgoing prompt to a JSON file for debugging
  * (async_llm_client.py:240-257).
  *
  * Spark-first: a template is also a COLUMN formatter — `formatCol` folds
  * the `{var}` substitutions into codegen'd `replace` calls, so building
  * per-row LLM payloads is a projection, not a driver loop. Template text
  * here is original; only the structure (stages, variables, set names)
  * mirrors the reference.
  */
case class PromptTemplate(template: String, inputVariables: Seq[String]) {
  /** The template split into literal / variable-slot tokens ONCE at
    * construction. Substitution then CONCATENATES — single pass over
    * the template, exactly Python str.format's semantics: substituted
    * VALUES are never re-scanned. The previous fold-of-`replace` form
    * rescanned the accumulated string, so a document chunk containing
    * the literal text "{question}" would have the question spliced
    * into the context region of the emitted payload — data-driven
    * prompt corruption. */
  private val tokens: Seq[Either[String, String]] = {
    if (inputVariables.isEmpty) Seq(Left(template))
    else {
      val re = inputVariables
        .map(v => java.util.regex.Pattern.quote(s"{$v}")).mkString("|")
      val m = java.util.regex.Pattern.compile(re).matcher(template)
      val buf = Seq.newBuilder[Either[String, String]]
      var last = 0
      while (m.find()) {
        if (m.start > last) buf += Left(template.substring(last, m.start))
        buf += Right(template.substring(m.start + 1, m.end - 1))
        last = m.end
      }
      if (last < template.length) buf += Left(template.substring(last))
      buf.result()
    }
  }

  /** Driver-side formatting (the reference's PromptTemplate.format);
    * unbound variables fill as "". */
  def format(vars: Map[String, String]): String =
    tokens.map {
      case Left(literal) => literal
      case Right(v)      => vars.getOrElse(v, "")
    }.mkString

  /** Column-level formatting: each input variable is filled from a column
    * (building per-row LLM payloads stays a codegen'd projection).
    * Missing bindings are left as-is (visible in the debug log, like the
    * reference's unformatted braces). */
  def formatCol(bindings: Map[String, Column]): Column =
    concat(tokens.map {
      case Left(literal) => lit(literal)
      case Right(v)      => bindings.getOrElse(v, lit(s"{$v}"))
    }: _*)
}

case class PromptSet(name: String, prompts: Map[String, PromptTemplate])

object Prompts {

  private def t(vars: String*)(template: String): PromptTemplate =
    PromptTemplate(template, vars)

  private val mapHybrid = t("context", "question")(
    "You are a careful financial analyst.\n" +
      "Answer the question from the context only; say you don't know when " +
      "the context is insufficient, and end with Score: 0-10 for how fully " +
      "the question was answered.\n" +
      "Context:\n{context}\nQuestion:\n{question}\nHelpful Answer:")
  private val mapJson = t("context", "question")(
    "Answer from the context only and reply as JSON " +
      "{\"answer\": ..., \"score\": 0-10}.\n" +
      "Context:\n{context}\nQuestion:\n{question}")
  private val mapPlain = t("context", "question")(
    "Answer from the context only, then rate relevance 0-100 on a final " +
      "Score: line.\nContext:\n{context}\nQuestion:\n{question}")
  private val reduceHybrid = t("summaries", "question")(
    "Combine the partial answers below into one final answer to the " +
      "question; do not invent facts.\nPartial answers:\n{summaries}\n" +
      "Question:\n{question}\nFinal Answer:")
  private val reduceJson = t("summaries", "question")(
    "Combine the XML-wrapped chunk answers into a final JSON " +
      "{\"answer\": ...}.\nChunks:\n{summaries}\nQuestion:\n{question}")
  private val judge = t("question", "gold_answer", "model_answer")(
    "Judge the model answer against the gold answer for the question. " +
      "Reply with exactly one of: Correct, Coherent, Deviated, Incorrect, " +
      "No answer.\nQuestion: {question}\nGold: {gold_answer}\n" +
      "Model: {model_answer}\nJudgment:")
  private val improve = t("question")(
    "Rewrite the question to be self-contained and unambiguous; keep its " +
      "meaning.\nQuestion: {question}\nImproved question:")
  private val direct = t("context", "question")(
    "Answer the question using the document below.\nDocument:\n{context}\n" +
      "Question:\n{question}\nAnswer:")
  private val mapFinqa = t("context", "question")(
    "Extract the numeric answer from the context; show the arithmetic as " +
      "op(arg1, arg2).\nContext:\n{context}\nQuestion:\n{question}")
  private val reduceFinqa = t("summaries", "question")(
    "Pick the best-supported numeric answer from the candidates.\n" +
      "Candidates:\n{summaries}\nQuestion:\n{question}\nAnswer:")

  /** The six named sets of prompt_config.yml. */
  val registry: Map[String, PromptSet] = Map(
    "default" -> PromptSet("default", Map(
      "map_prompt" -> mapHybrid, "reduce_prompt" -> reduceHybrid,
      "judge_prompt" -> judge)),
    "baseline" -> PromptSet("baseline", Map(
      "map_prompt" -> mapPlain, "reduce_prompt" -> reduceHybrid,
      "judge_prompt" -> judge)),
    "standard" -> PromptSet("standard", Map(
      "map_prompt" -> mapJson, "reduce_prompt" -> reduceJson,
      "judge_prompt" -> judge)),
    "hybrid" -> PromptSet("hybrid", Map(
      "map_prompt" -> mapHybrid, "reduce_prompt" -> reduceHybrid,
      "judge_prompt" -> judge, "question_improvement_prompt" -> improve)),
    "direct" -> PromptSet("direct", Map(
      "map_prompt" -> direct, "reduce_prompt" -> direct,
      "judge_prompt" -> judge)),
    "finqa" -> PromptSet("finqa", Map(
      "map_prompt" -> mapFinqa, "reduce_prompt" -> reduceFinqa,
      "judge_prompt" -> judge)))

  val defaultSet: String = "default"

  /** Factory dispatch (factory.py:92-101): named set with default
    * fallback; unknown names fail fast like the reference's KeyError. */
  def resolve(name: Option[String]): PromptSet = {
    val key = name.getOrElse(defaultSet)
    registry.getOrElse(key, throw new IllegalArgumentException(
      s"unknown prompt set '$key'; known: ${registry.keys.toSeq.sorted.mkString(", ")}"))
  }

  // ---- S12: serialize / reload (base_pipeline.py:634-703 shape) ----

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `prompts_dict` JSON: every template serialized with the reference's
    * `langchain_prompt_template` tag + input variables. */
  def toJson(set: PromptSet): String =
    set.prompts.toSeq.sortBy(_._1).map { case (k, p) =>
      s""""${esc(k)}":{"type":"langchain_prompt_template","template":"${esc(p.template)}","input_variables":[${
        p.inputVariables.map(v => s""""${esc(v)}"""").mkString(",")}]}"""
    }.mkString(s"""{"name":"${esc(set.name)}","prompts_dict":{""", ",", "}}")

  /** Reconstruct a [[PromptSet]] from the serialized form (the reference's
    * load_prompts_from_json, including the plain-string fallback). */
  def fromJson(json: String): PromptSet = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val name = (root \ "name").extractOpt[String].getOrElse(defaultSet)
    val prompts = (root \ "prompts_dict") match {
      case JObject(fields) => fields.map { case (k, v) =>
        val tpl = v match {
          case o: JObject if (o \ "type") == JString("langchain_prompt_template") =>
            PromptTemplate((o \ "template").extract[String],
              (o \ "input_variables").extract[Seq[String]])
          case o: JObject => PromptTemplate((o \ "template").extract[String], Nil)
          case JString(s) => PromptTemplate(s, Nil) // old-format fallback
          case other => PromptTemplate(other.toString, Nil)
        }
        k -> tpl
      }.toMap
      case _ => Map.empty[String, PromptTemplate]
    }
    PromptSet(name, prompts)
  }

  // ---- S13: prompt debug log sink (async_llm_client.py:240-257) ----

  /** Write one JSON record per formatted prompt under `logDir`, stamped
    * with a uuid + timestamp like the reference's PromptLogger. A
    * distributed sink (executors write their partitions), not a driver
    * loop. */
  def logPrompts(prompts: DataFrame, promptCol: String, logDir: String): Unit =
    prompts.select(
        expr("uuid()").as("prompt_id"),
        col(promptCol).as("prompt"),
        current_timestamp().cast("double").as("timestamp"))
      .write.mode("append").json(logDir)
}
