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
            // declared arity for overload ranking: top-level params on the
            // def line, minus the conventional receiver when the def sits
            // directly in a class body (callers never pass self/cls)
            val paren = decl.indexOf('(')
            val raw = Arity.countArgs(decl, paren)
            val inClass = parent >= 0 && entities(parent).label == "Class"
            val firstParam = if (raw > 0)
              decl.substring(paren + 1).dropWhile(_.isWhitespace)
                .takeWhile(c => c.isLetterOrDigit || c == '_')
              else ""
            val arity =
              if (raw < 0) -1
              else if (inClass && (firstParam == "self" || firstParam == "cls"))
                raw - 1
              else raw
            entities += EntityDecl("Function", name, i.toLong, i.toLong, "",
              parent, arity)
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
            // decorator lines are not body statements: tree-sitter's call
            // collection runs over function BODIES, so `@lru_cache(2)`
            // must not surface as a call ref from the enclosing scope
            if (!trimmed.startsWith("@"))
              CallRe.findAllMatchIn(line).foreach { m =>
                val callee = m.group(1)
                if (!Keywords.contains(callee))
                  refs += SymbolRef("call", enclosing, callee, i.toLong,
                    line.trim, Arity.countArgs(line, m.end - 1))
              }
        }
        lastNonEmpty = i
      }
    }
    closeScopesDownTo(0, lines.length)
    FileExtraction(entities.toSeq, refs.toSeq)
  }
}
