package graft.api

import org.apache.spark.sql.functions._

import graft.graph.{GraphQueries, PropertyGraph}

/** F11 — the NL→graph-query chat surface (`/root/reference/api/llm.py`).
  *
  * The reference wires an LLM (graphrag_sdk + LiteModel) to a hand-written
  * ontology and two prompt templates; the model itself is an external
  * service. Here the ontology is data ([[Ontology]]) and the model is a
  * pluggable [[ChatClient]]: production code can drop in a real LLM client,
  * tests use [[CannedChatClient]], and the default [[RuleChatClient]]
  * answers the common question shapes with REAL graph queries — no network,
  * deterministic, still useful.
  */
object Ontology {

  /** (label, attributes) — `api/llm.py:57-206`. */
  val entities: Seq[(String, Seq[String])] = Seq(
    "File" -> Seq("name", "path", "ext"),
    "Class" -> Seq("name", "path", "src_start", "src_end", "doc"),
    "Function" -> Seq("name", "path", "src_start", "src_end", "args", "src"),
    "Interface" -> Seq("name", "path", "src_start", "src_end", "doc"))

  /** (relation, from, to) — `api/llm.py:222-230`. */
  val relations: Seq[(String, String, String)] = Seq(
    ("CALLS", "Class", "Function"),
    ("CALLS", "Function", "Function"),
    ("DEFINES", "File", "Class"),
    ("DEFINES", "File", "Function"),
    ("DEFINES", "Class", "Class"),
    ("EXTENDS", "Class", "Class"),
    ("IMPLEMENTS", "Class", "Interface"),
    ("DEFINES", "Class", "Function"),
    ("DEFINES", "Function", "Function"))

  /** Textual ontology for prompt assembly (the CYPHER_GEN_SYSTEM context,
    * `api/prompts.py`). */
  def describe: String = {
    val es = entities.map { case (l, attrs) =>
      s"($l {${attrs.mkString(", ")}})" }.mkString("\n")
    val rs = relations.map { case (r, f, t) => s"($f)-[:$r]->($t)" }.mkString("\n")
    s"Entities:\n$es\nRelations:\n$rs"
  }
}

/** Pluggable model hook — `ask` mirrors `api/llm.py:260-267`. */
trait ChatClient {
  def ask(repo: String, question: String, g: PropertyGraph): String
}

/** Test double: fixed responses keyed by question (records calls). */
final class CannedChatClient(answers: Map[String, String],
    default: String = "I don't know.") extends ChatClient {
  val asked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  def ask(repo: String, question: String, g: PropertyGraph): String = {
    asked += ((repo, question))
    answers.getOrElse(question, default)
  }
}

/** Default stub: rule-based NL→query translation over the ontology's verbs
  * — each recognized shape runs the corresponding graph query. */
object RuleChatClient extends ChatClient {
  private val WhoCalls = """(?i).*who calls (\w+).*""".r
  private val WhatCalls = """(?i).*what does (\w+) call.*""".r
  private val ListLabel = """(?i).*(?:list|how many) (\w+?)(?:es|s)?\b.*""".r

  def ask(repo: String, question: String, g: PropertyGraph): String =
    question match {
      case WhoCalls(name) =>
        val callers = GraphQueries.functionCalledBy(g, name).collect()
          .flatMap(r => Option(r.getAs[scala.collection.Seq[String]]("callers")))
          .flatten.distinct.sorted
        if (callers.isEmpty) s"No callers of $name found."
        else s"$name is called by: ${callers.mkString(", ")}"
      case WhatCalls(name) =>
        val callees = GraphQueries.functionCalls(g, name).collect()
          .flatMap(r => Option(r.getAs[scala.collection.Seq[String]]("callees")))
          .flatten.distinct.sorted
        if (callees.isEmpty) s"$name calls nothing."
        else s"$name calls: ${callees.mkString(", ")}"
      case ListLabel(raw) =>
        val label = raw.capitalize match {
          case "Class" => "Class"
          case "Classe" => "Class"
          case l => l
        }
        val names = g.nodes
          .filter(array_contains(col("labels"), label))
          .select(col("name")).orderBy(col("name")).limit(25)
          .collect().map(_.getString(0))
        if (names.isEmpty) s"No $label entities found."
        else s"$label entities: ${names.mkString(", ")}"
      case _ =>
        "I can answer questions about this code graph.\n" + Ontology.describe
    }
}
