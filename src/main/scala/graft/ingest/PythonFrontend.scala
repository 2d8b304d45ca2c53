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
  // group 1 = dotted receiver prefix ("np." / "a.b."), group 2 = callee
  private val CallRe =
    """((?:[A-Za-z_][A-Za-z0-9_]*\.)*)([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r
  private val ImportRe = """^import\s+(.+)$""".r
  private val FromImportRe = """^from\s+([.\w]+)\s+import\s+(.+)$""".r
  private val Keywords = Set("if", "elif", "while", "for", "return", "yield",
    "with", "assert", "print_function", "def", "class", "lambda", "except",
    "raise", "in", "not", "and", "or", "del")

  /** Parse one import statement into scope bindings
    * (`import a.b`, `import a.b as x`, `from m import f, g as h`).
    * Wildcard and parenthesized continuation-line tails degrade to
    * whatever names sit on this line — heuristic-frontend contract. */
  private def parseImports(trimmed0: String): Seq[ImportDecl] = {
    // strip a trailing comment (`import os  # for paths`) — string
    // literals never appear on well-formed import lines, so a bare '#'
    // cut is safe here and keeps the bindings parseable
    val trimmed = trimmed0.takeWhile(_ != '#').trim
    trimmed match {
    case FromImportRe(module0, names) =>
      // relative `from .m import f` → module "m" (resolver matches module
      // paths as dot-boundary suffixes, so the leading dots only hurt)
      val module = module0.replaceAll("^\\.+", "")
      names.replace("(", "").replace(")", "").split(",").toSeq
        .map(_.trim).filter(n => n.nonEmpty && n != "*")
        .flatMap { part =>
          part.split("\\s+as\\s+") match {
            case Array(sym) if sym.matches("\\w+") =>
              Some(ImportDecl(sym, module, sym))
            case Array(sym, alias) if sym.matches("\\w+") && alias.matches("\\w+") =>
              Some(ImportDecl(alias, module, sym))
            case _ => None
          }
        }
    case ImportRe(names) =>
      names.split(",").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { part =>
        part.split("\\s+as\\s+") match {
          case Array(mod) if mod.matches("[.\\w]+") =>
            // `import a.b` binds `a` to module a (the usable prefix)
            Some(ImportDecl(mod.split("\\.").head, mod.split("\\.").head, ""))
          case Array(mod, alias) if mod.matches("[.\\w]+") && alias.matches("\\w+") =>
            Some(ImportDecl(alias, mod, ""))
          case _ => None
        }
      }
    case _ => Nil
    }
  }

  def extract(path: String, source: String): FileExtraction = {
    val lines = source.split("\n", -1)
    val entities = ArrayBuffer.empty[EntityDecl]
    val refs = ArrayBuffer.empty[SymbolRef]
    val imports = ArrayBuffer.empty[ImportDecl]
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
            val params0 = Arity.topLevelArgs(decl, paren)
            val firstParam = params0.headOption.getOrElse("")
              .takeWhile(c => c.isLetterOrDigit || c == '_')
            val dropReceiver =
              inClass && (firstParam == "self" || firstParam == "cls")
            val params = if (dropReceiver) params0.drop(1) else params0
            // required-vs-total range for the resolver's overload ranking:
            // defaults and *args/**kwargs are optional at the call site;
            // a bare `*` (keyword-only marker) binds nothing either way
            val hasVarargs = params.exists(_.startsWith("*"))
            val arity =
              if (raw < 0) -1
              else if (hasVarargs) 99 // effectively unbounded max
              else params.length
            val minArity =
              if (raw < 0) -1
              else params.count(p => !p.contains("=") && !p.startsWith("*"))
            entities += EntityDecl("Function", name, i.toLong, i.toLong, "",
              parent, arity, minArity)
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
            val importDecls = parseImports(trimmed)
            // decorator lines are not body statements: tree-sitter's call
            // collection runs over function BODIES, so `@lru_cache(2)`
            // must not surface as a call ref from the enclosing scope.
            // Import lines bind scope, they don't call — keyed on the line
            // HEAD, not on whether bindings parsed, so a parenthesized
            // continuation head (`from typing import (`) cannot fall
            // through to CallRe and fabricate a call to "import".
            val isImportLine =
              trimmed.startsWith("import ") || trimmed.startsWith("from ")
            if (importDecls.nonEmpty) imports ++= importDecls
            else if (!trimmed.startsWith("@") && !isImportLine)
              CallRe.findAllMatchIn(line).foreach { m =>
                val callee = m.group(2)
                if (!Keywords.contains(callee))
                  refs += SymbolRef("call", enclosing, callee, i.toLong,
                    line.trim, Arity.countArgs(line, m.end - 1),
                    m.group(1).stripSuffix("."))
              }
        }
        lastNonEmpty = i
      }
    }
    closeScopesDownTo(0, lines.length)
    FileExtraction(entities.toSeq, refs.toSeq, imports.toSeq)
  }
}
