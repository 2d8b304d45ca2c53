package graft.ingest

/** One declared entity in a source file. `parentIdx` indexes into the same
  * extraction's entity list (-1 = directly under the File node) — the
  * DEFINES containment hierarchy
  * (`/root/reference/api/analyzers/source_analyzer.py:61-75`). */
final case class EntityDecl(
    label: String, // Function | Class | Interface | Enum | Struct | Method | Constructor
    name: String,
    srcStart: Long,
    srcEnd: Long,
    doc: String,
    parentIdx: Int,
    arity: Int = -1, // declared parameter count (max); -1 = unknown / not callable
    minArity: Int = -1) // required parameter count (params without defaults);
                        // -1 = unknown → resolver treats it as == arity

/** One import/using/alias binding declared by a file — the scope table the
  * reference's LSP `request_definition` consults implicitly
  * (`api/analyzers/source_analyzer.py:118-169`). `alias` is the name the
  * importing file actually uses; `module` is the dotted module/package it
  * comes from; `symbol` is the real declared name there ("" for whole-
  * module imports like Python `import x as y`, where no member is bound). */
final case class ImportDecl(alias: String, module: String, symbol: String)

/** One symbol reference collected during parse, to be resolved to a target
  * entity in the second pass
  * (`api/analyzers/source_analyzer.py:118-169` symbol kinds). */
final case class SymbolRef(
    kind: String, // call | base_class | implement_interface | extend_interface | return_type | parameters
    fromIdx: Int, // entity index the reference occurs in (-1 = module level)
    name: String, // referenced symbol name
    line: Long,
    text: String,
    nargs: Int = -1, // call-site argument count; -1 = unknown / not a call
    qualifier: String = "") // dotted receiver prefix of a qualified call
                            // (`np.array(..)` -> "np", `a.b.f(..)` -> "a.b");
                            // "" = bare call. The resolver maps the HEAD
                            // segment through the calling file's import
                            // aliases (`import numpy as np` makes np.array
                            // resolve inside module numpy).

/** Shared single-line argument/parameter counting for the heuristic
  * frontends — feeds the resolver's overload ranking (the cheap slice of
  * what the reference gets from LSP signatures,
  * `api/analyzers/source_analyzer.py:118-169`). */
object Arity {
  /** Number of top-level comma-separated items in the paren group whose
    * `(` sits at index `open` of `s`; -1 when the group does not close in
    * `s` (multi-line signature — unknown beats a wrong guess). */
  def countArgs(s: String, open: Int): Int = {
    if (open < 0 || open >= s.length || s.charAt(open) != '(') return -1
    var i = open + 1
    var depth = 1
    var commas = 0
    var seen = false
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '(' | '[' | '{' => depth += 1; seen = true
        case ')' | ']' | '}' => depth -= 1
        case ',' if depth == 1 => commas += 1
        case c => if (!c.isWhitespace) seen = true
      }
      i += 1
    }
    if (depth != 0) -1
    else if (!seen) 0
    else commas + 1
  }

  /** The top-level comma-separated items of the paren group whose `(`
    * sits at index `open` of `s`; Nil when the group is empty or does not
    * close in `s`. Same nesting rules as [[countArgs]]. */
  def topLevelArgs(s: String, open: Int): Seq[String] = {
    if (open < 0 || open >= s.length || s.charAt(open) != '(') return Nil
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = open + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case c @ ('(' | '[' | '{') => depth += 1; cur.append(c)
        case c @ (')' | ']' | '}') =>
          depth -= 1; if (depth > 0) cur.append(c)
        case ',' if depth == 1 => parts += cur.toString; cur.clear()
        case c => cur.append(c)
      }
      i += 1
    }
    if (depth != 0) Nil
    else {
      parts += cur.toString
      val out = parts.toSeq.map(_.trim)
      if (out.forall(_.isEmpty)) Nil else out
    }
  }
}

final case class FileExtraction(entities: Seq[EntityDecl], refs: Seq[SymbolRef],
    imports: Seq[ImportDecl] = Nil)

/** Per-language parser surface — the Spark-native mirror of the reference's
  * `AbstractAnalyzer` extension point (8 abstract methods,
  * `/root/reference/api/analyzers/analyzer.py:10-144`; registration per
  * extension at `api/analyzers/source_analyzer.py:24-29`).
  *
  * Implementations must be Serializable: extraction runs inside
  * `mapPartitions` on executors (SURVEY §3.1 Spark trace — parsing is data-
  * parallel, unlike the reference's per-entity Cypher round trips). */
trait LanguageFrontend extends Serializable {
  def language: String
  /** extensions handled, with dot — mirrors the rglob filter
    * (`api/analyzers/source_analyzer.py:175-182`). */
  def extensions: Set[String]
  def extract(path: String, source: String): FileExtraction
}
