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
    arity: Int = -1) // declared parameter count; -1 = unknown / not callable

/** One symbol reference collected during parse, to be resolved to a target
  * entity in the second pass
  * (`api/analyzers/source_analyzer.py:118-169` symbol kinds). */
final case class SymbolRef(
    kind: String, // call | base_class | implement_interface | extend_interface | return_type | parameters
    fromIdx: Int, // entity index the reference occurs in (-1 = module level)
    name: String, // referenced symbol name
    line: Long,
    text: String,
    nargs: Int = -1) // call-site argument count; -1 = unknown / not a call

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
}

final case class FileExtraction(entities: Seq[EntityDecl], refs: Seq[SymbolRef])

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
