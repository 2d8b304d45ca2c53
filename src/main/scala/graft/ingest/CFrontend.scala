package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Shared C-family source-line cleanup: strip `//` and `/* */` comments
  * and blank out string/char literals, carrying the block-comment state
  * across lines. */
object CSource {
  def stripLine(line: String, inBlock: Boolean): (String, Boolean) = {
    val sb = new StringBuilder
    var i = 0
    var block = inBlock
    var quote: Char = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (block) {
        if (c == '*' && i + 1 < line.length && line.charAt(i + 1) == '/') {
          block = false; i += 1
        }
      } else if (quote != 0) {
        if (c == '\\') i += 1
        else if (c == quote) quote = 0
      } else c match {
        case '/' if i + 1 < line.length && line.charAt(i + 1) == '/' =>
          i = line.length
        case '/' if i + 1 < line.length && line.charAt(i + 1) == '*' =>
          block = true; i += 1
        case '"' | '\'' => quote = c; sb.append(' ')
        case other => sb.append(other)
      }
      i += 1
    }
    (sb.toString, block)
  }
}

/** Heuristic C frontend — the reference ships a C analyzer
  * (`/root/reference/api/analyzers/c/analyzer.py`, golden test
  * `tests/test_c_analyzer.py:26-61` over `tests/source_files/c/src.c`)
  * that is currently commented out of the extension registry
  * (`api/analyzers/source_analyzer.py:25-26`); this frontend covers its
  * surface so a repo with C sources ingests the same entities: top-level
  * functions (MULTI-LINE signatures included — the fixture's `add` spans
  * five lines), `struct` declarations as Struct entities, and call sites
  * inside function bodies (including recursion — `add` calling itself is
  * a caller of `add` in the golden test). Field lists are not modeled
  * (EntityDecl carries no field table; same deviation as the C# structs).
  *
  * Shape: top-level declaration text accumulates until `{` (definition —
  * entity opens, srcStart = accumulation start) or `;` (prototype or
  * statement — dropped); brace depth closes scopes and patches srcEnd.
  * Line numbers 0-based like every frontend here. */
object CFrontend extends LanguageFrontend {
  val language = "c"
  val extensions: Set[String] = Set(".c", ".h")

  private val ctrl = Set("if", "else", "for", "while", "switch", "return",
    "sizeof", "do", "goto", "case", "break", "continue", "typedef",
    "static", "union", "enum", "const")
  private val CallRe = """([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r
  private val StructRe = """struct\s+([A-Za-z_][A-Za-z0-9_]*)\s*\{""".r.unanchored

  def extract(path: String, source: String): FileExtraction = {
    val lines = source.split("\n", -1)
    val entities = ArrayBuffer.empty[EntityDecl]
    val refs = ArrayBuffer.empty[SymbolRef]
    // open scopes: (closeDepth, entityIdx or -1 non-entity, isFunction)
    val scopes = ArrayBuffer.empty[(Int, Int, Boolean)]
    var depth = 0
    var inBlock = false
    // top-level declaration accumulation
    var pendStart = -1
    val pend = new StringBuilder

    def resetPend(): Unit = { pendStart = -1; pend.setLength(0) }

    for (i <- lines.indices) {
      val (stripped, blockAfter) = CSource.stripLine(lines(i), inBlock)
      inBlock = blockAfter
      val t0 = stripped.trim
      // preprocessor lines carry no brace or semicolon: without this skip,
      // a leading `#include <stdio.h>` would sit in the declaration
      // accumulator forever and shift every srcStart in the file
      val t = if (t0.startsWith("#")) "" else t0
      if (t.nonEmpty) {
        if (depth == 0 && scopes.isEmpty) {
          if (pendStart < 0) pendStart = i
          if (pend.nonEmpty) pend.append(' ')
          pend.append(t)
          val buf = pend.toString
          val brace = buf.indexOf('{')
          if (brace >= 0) {
            val head = buf.substring(0, brace)
            StructRe.findFirstMatchIn(buf) match {
              case Some(m) =>
                entities += EntityDecl("Struct", m.group(1),
                  pendStart.toLong, pendStart.toLong, "", -1)
                scopes += ((depth + 1, entities.size - 1, false))
              case None =>
                // function definition: name = identifier before the first
                // '(' of the signature; arity from its top-level commas
                val paren = head.indexOf('(')
                val name =
                  if (paren < 0) ""
                  else head.substring(0, paren).trim
                    .split("[^A-Za-z0-9_]+").filter(_.nonEmpty)
                    .lastOption.getOrElse("")
                if (name.nonEmpty && !ctrl.contains(name)) {
                  val arity = Arity.countArgs(buf, paren)
                  entities += EntityDecl("Function", name,
                    pendStart.toLong, pendStart.toLong, "", -1, arity)
                  val fnIdx = entities.size - 1
                  scopes += ((depth + 1, fnIdx, true))
                  // body text on the DECLARATION line itself (K&R one-
                  // liners: `int f(int x) { return g(x); }`) was consumed
                  // by the accumulator — scan the remainder after the
                  // opening '{' for calls now, attributed to the new
                  // entity, or they are silently dropped (tree-sitter
                  // collects body calls regardless of line layout)
                  val body = buf.substring(brace + 1)
                  CallRe.findAllMatchIn(body).foreach { m =>
                    val callee = m.group(1)
                    if (!ctrl.contains(callee))
                      refs += SymbolRef("call", fnIdx, callee, i.toLong,
                        body.trim, Arity.countArgs(body, m.end - 1))
                  }
                } else
                  scopes += ((depth + 1, -1, false)) // anonymous block
            }
            resetPend()
          } else if (t.endsWith(";") || (!buf.contains("(") && t.contains(";"))) {
            resetPend() // prototype / global declaration / statement
          }
        } else {
          // inside a scope: collect calls when the innermost entity scope
          // is a function body
          val enclosing = scopes.reverseIterator
            .collectFirst { case (_, idx, isFn) if idx >= 0 => (idx, isFn) }
          enclosing match {
            case Some((idx, true)) =>
              CallRe.findAllMatchIn(t).foreach { m =>
                val callee = m.group(1)
                if (!ctrl.contains(callee))
                  refs += SymbolRef("call", idx, callee, i.toLong, t,
                    Arity.countArgs(t, m.end - 1))
              }
            case _ => ()
          }
        }
        depth += t.count(_ == '{') - t.count(_ == '}')
        while (scopes.nonEmpty && depth < scopes.last._1) {
          val (_, idx, _) = scopes.remove(scopes.size - 1)
          if (idx >= 0)
            entities(idx) = entities(idx).copy(srcEnd = i.toLong)
        }
      }
    }
    // close any scopes left open at EOF
    scopes.reverseIterator.foreach { case (_, idx, _) =>
      if (idx >= 0)
        entities(idx) = entities(idx).copy(srcEnd = (lines.length - 1).toLong)
    }
    FileExtraction(entities.toSeq, refs.toSeq)
  }
}
