package graft.ingest

import graft.graph.OpLog

/** Pre-extracted JSONL ingest contract (SURVEY §7.1 module 6 decision:
  * "JSONL first — decouples tree-sitter availability"). One `.jsonl` file
  * per source file (logical path = file path minus `.jsonl`); each line is
  *
  *   {"kind":"entity","label":"Function","name":"f","start":1,"end":3,
  *    "doc":"","parent":-1}
  *   {"kind":"ref","refKind":"call","from":0,"name":"g","line":2,
  *    "text":"g()"}
  *
  * Entity `parent` / ref `from` index into the entity lines of the same
  * file in order (-1 = file level), exactly like [[FileExtraction]]. */
object JsonlFrontend extends LanguageFrontend {
  val language = "jsonl"
  val extensions: Set[String] = Set(".jsonl")

  def logicalPath(path: String): String = path.stripSuffix(".jsonl")

  def extract(path: String, source: String): FileExtraction = {
    val entities = Vector.newBuilder[EntityDecl]
    val refs = Vector.newBuilder[SymbolRef]
    val imports = Vector.newBuilder[ImportDecl]
    source.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val node = OpLog.mapper.readTree(line)
      node.get("kind").asText() match {
        case "entity" => entities += EntityDecl(
          node.get("label").asText(), node.get("name").asText(),
          node.get("start").asLong(), node.get("end").asLong(),
          Option(node.get("doc")).map(_.asText("")).getOrElse(""),
          Option(node.get("parent")).map(_.asInt(-1)).getOrElse(-1),
          Option(node.get("arity")).map(_.asInt(-1)).getOrElse(-1),
          Option(node.get("min_arity")).map(_.asInt(-1)).getOrElse(-1))
        case "ref" => refs += SymbolRef(
          node.get("refKind").asText(),
          Option(node.get("from")).map(_.asInt(-1)).getOrElse(-1),
          node.get("name").asText(),
          Option(node.get("line")).map(_.asLong(0L)).getOrElse(0L),
          Option(node.get("text")).map(_.asText("")).getOrElse(""),
          Option(node.get("nargs")).map(_.asInt(-1)).getOrElse(-1),
          Option(node.get("qualifier")).map(_.asText("")).getOrElse(""))
        case "import" => imports += ImportDecl(
          node.get("alias").asText(),
          Option(node.get("module")).map(_.asText("")).getOrElse(""),
          Option(node.get("symbol")).map(_.asText("")).getOrElse(""))
        case other => throw new IllegalArgumentException(s"bad jsonl kind: $other")
      }
    }
    FileExtraction(entities.result(), refs.result(), imports.result())
  }
}
