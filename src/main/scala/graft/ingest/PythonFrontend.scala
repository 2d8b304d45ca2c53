package graft.ingest

import scala.collection.mutable.{ArrayBuffer, Stack}

/** Heuristic Python parser: indentation-scoped `def`/`class` declarations,
  * call-site collection, base-class extraction. Replaces the reference's
  * tree-sitter + LSP pipeline (`/root/reference/api/analyzers/python/
  * analyzer.py`) with a pure-Scala extractor (SURVEY §7.4 risk 5: the JSONL
  * contract + this heuristic frontend decouple us from native parser
  * availability; resolution is name-based).
  *
  * Line numbers are 0-based like the current reference API
  * (FIXTURES.md §1.1: "0-based rows in current API").
  */
object PythonFrontend extends LanguageFrontend {
  val language = "python"
  val extensions: Set[String] = Set(".py")

  private val DefRe = """^(\s*)def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r.unanchored
  private val ClassRe = """^(\s*)class\s+([A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s*:""".r.unanchored
  private val CallRe = """([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r
  private val Keywords = Set("if", "elif", "while", "for", "return", "yield",
    "with", "assert", "print_function", "def", "class", "lambda", "except",
    "raise", "in", "not", "and", "or", "del")

  def extract(path: String, source: String): FileExtraction = {
    val lines = source.split("\n", -1)
    val entities = ArrayBuffer.empty[EntityDecl]
    val refs = ArrayBuffer.empty[SymbolRef]
    // open scopes: (indent, entityIdx); entity srcEnd patched when closed
    val scopes = Stack.empty[(Int, Int)]
    var lastNonEmpty = 0

    def closeScopesDownTo(indent: Int, line: Int): Unit =
      while (scopes.nonEmpty && scopes.top._1 >= indent) {
        val (_, idx) = scopes.pop()
        entities(idx) = entities(idx).copy(srcEnd = lastNonEmpty.toLong)
      }

    for (i <- lines.indices) {
      val line = lines(i)
      val trimmed = line.trim
      if (trimmed.nonEmpty && !trimmed.startsWith("#")) {
        val indent = line.indexWhere(!_.isWhitespace) match {
          case -1 => 0
          case n => n
        }
        // `async def` declares the same entity as `def` (name, scope and
        // body indent are unchanged); normalizing here keeps it out of the
        // content-line arm, which would both miss the Function entity and
        // record the signature as a spurious call ref
        val decl =
          if (trimmed.startsWith("async def ")) line.replaceFirst("async\\s+", "")
          else line
        decl match {
          case DefRe(ws, name) if decl.trim.startsWith("def ") =>
            closeScopesDownTo(ws.length, i)
            val parent = if (scopes.isEmpty) -1 else scopes.top._2
            entities += EntityDecl("Function", name, i.toLong, i.toLong, "", parent)
            scopes.push((ws.length, entities.size - 1))
          case ClassRe(ws, name, _, bases) if line.trim.startsWith("class ") =>
            closeScopesDownTo(ws.length, i)
            val parent = if (scopes.isEmpty) -1 else scopes.top._2
            entities += EntityDecl("Class", name, i.toLong, i.toLong, "", parent)
            val idx = entities.size - 1
            scopes.push((ws.length, idx))
            Option(bases).foreach(_.split(",").map(_.trim).filter(b =>
              b.nonEmpty && b != "object").foreach { b =>
              refs += SymbolRef("base_class", idx, b.takeWhile(c =>
                c.isLetterOrDigit || c == '_'), i.toLong, line.trim)
            })
          case _ =>
            // a content line at indent N ends every scope declared at >= N
            // (bodies are indented strictly deeper than their declaration)
            closeScopesDownTo(indent, i)
            val enclosing = if (scopes.isEmpty) -1 else scopes.top._2
            CallRe.findAllMatchIn(line).foreach { m =>
              val callee = m.group(1)
              if (!Keywords.contains(callee))
                refs += SymbolRef("call", enclosing, callee, i.toLong, line.trim)
            }
        }
        lastNonEmpty = i
      }
    }
    closeScopesDownTo(0, lines.length)
    FileExtraction(entities.toSeq, refs.toSeq)
  }
}
