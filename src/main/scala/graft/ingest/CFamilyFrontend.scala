package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Shared heuristic parser for brace-scoped C-family languages — the
  * pure-Scala stand-in for the reference's tree-sitter grammars
  * (`/root/reference/api/analyzers/java/analyzer.py`,
  * `api/analyzers/csharp/analyzer.py`), same extraction surface:
  * type declarations with their heritage clauses, methods/constructors with
  * parameter and return types, and call sites inside callable bodies.
  *
  * The scope model is brace depth (strings and comments stripped first):
  * a declaration opens a scope that closes when depth returns below the
  * declaration's level; bodyless declarations (interface members, abstract
  * methods — trailing `;`) never open one. Line numbers are 0-based like
  * the other frontends.
  */
abstract class CFamilyFrontend extends LanguageFrontend {

  /** type keyword -> entity label (e.g. "class" -> "Class"). */
  protected def typeLabels: Map[String, String]

  /** Heritage refs for one type declaration:
    * (kinds per target) from the clause after the name. */
  protected def heritageRefs(label: String, clause: String): Seq[(String, String)]

  /** Scope binding from one top-level import/using line, if any. */
  protected def parseImport(trimmed: String): Option[ImportDecl] = None

  protected val modifiers: Set[String] = Set("public", "private", "protected",
    "internal", "static", "final", "abstract", "sealed", "virtual", "override",
    "async", "synchronized", "native", "default", "strictfp", "transient",
    "volatile", "readonly", "partial", "extern", "unsafe", "const")

  private val ctrlKeywords = Set("if", "else", "for", "while", "switch",
    "catch", "return", "new", "do", "throw", "throws", "using", "lock",
    "foreach", "try", "yield", "case", "base", "this", "super", "goto",
    "typeof", "sizeof", "nameof", "assert")

  // group 1 = dotted receiver prefix ("Helper." / "a.b."), group 2 = callee
  private val CallRe =
    """((?:[A-Za-z_][A-Za-z0-9_]*\.)*)([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r

  /** Strip generic argument lists to a FIXPOINT: one pass handles
    * `List<Integer>` but leaves the outer shell of nested forms like
    * `Map<String, List<Integer>>` (the inner strip re-exposes the outer
    * pair), which then corrupts signature tokenization. */
  protected final def stripGenerics(s: String): String = {
    var cur = s
    var prev: String = null
    while (cur != prev) { prev = cur; cur = cur.replaceAll("<[^<>]*>", " ") }
    cur
  }

  /** Last identifier segment of a type expression: strip generics, arrays,
    * nullability, dotted qualifiers — name resolution is by simple name. */
  protected def baseTypeName(t: String): String = {
    val noGen = stripGenerics(t)
    val core = noGen.replace("[]", "").replace("?", "").replace("...", "").trim
    val seg = core.split('.').lastOption.getOrElse(core)
    seg.takeWhile(c => c.isLetterOrDigit || c == '_')
  }

  /** Strip line comments and string/char literals (block comments handled
    * by the caller's running state). */
  protected def stripLine(line: String, inBlock: Boolean): (String, Boolean) =
    CSource.stripLine(line, inBlock)

  private final case class Scope(idx: Int, closeDepth: Int, label: String,
      name: String, var armed: Boolean)

  def extract(path: String, source: String): FileExtraction = {
    val lines = source.split("\n", -1)
    val entities = ArrayBuffer.empty[EntityDecl]
    val refs = ArrayBuffer.empty[SymbolRef]
    val imports = ArrayBuffer.empty[ImportDecl]
    val scopes = ArrayBuffer.empty[Scope]
    var depth = 0
    var inBlock = false
    var lastNonEmpty = 0

    def innermost: Option[Scope] = scopes.lastOption
    def enclosingIdx: Int = innermost.map(_.idx).getOrElse(-1)
    def inType: Boolean = innermost.exists(s => typeLabels.values.exists(_ == s.label))
    def inCallable: Boolean =
      innermost.exists(s => s.label == "Method" || s.label == "Constructor")

    // trailing .* eats an opening brace on the decl line (K&R style); the
    // heritage tail group still stops at the first '{' or ';'
    val typeRe = ("""^(?:@\w+(?:\([^)]*\))?\s+)*(?:(?:""" +
      modifiers.mkString("|") + """)\s+)*(""" +
      typeLabels.keys.mkString("|") +
      """)\s+([A-Za-z_][A-Za-z0-9_]*)(?:<[^{;]*?>)?\s*([^{;]*).*""").r

    for (i <- lines.indices) {
      val (strippedRaw, blockAfter) = stripLine(lines(i), inBlock)
      inBlock = blockAfter
      val trimmed = strippedRaw.trim
      if (trimmed.nonEmpty) {
        var declaredScope: Option[(Int, String, String)] = None // idx, label, name
        var isDecl = false
        // parsed once per top-level line (was evaluated twice: once in the
        // match guard, once in the body)
        val importDecl =
          if (!inType && !inCallable) parseImport(trimmed) else None

        trimmed match {
          case typeRe(kw, name, tail) =>
            isDecl = true
            val label = typeLabels(kw)
            entities += EntityDecl(label, name, i.toLong, i.toLong, "", enclosingIdx)
            val idx = entities.size - 1
            heritageRefs(label, tail).foreach { case (kind, target) =>
              val t = baseTypeName(target)
              if (t.nonEmpty) refs += SymbolRef(kind, idx, t, i.toLong, trimmed)
            }
            declaredScope = Some((idx, label, name))
          case _ if importDecl.nonEmpty =>
            imports ++= importDecl
          case _ if inType && !inCallable =>
            parseCallable(trimmed, innermost.get.name).foreach {
              case (label, name, params, ret, bodyless, arity, minArity) =>
                isDecl = true
                entities += EntityDecl(label, name, i.toLong, i.toLong, "",
                  enclosingIdx, arity, minArity)
                val idx = entities.size - 1
                params.foreach { p =>
                  val t = baseTypeName(p)
                  if (t.nonEmpty) refs += SymbolRef("parameters", idx, t, i.toLong, trimmed)
                }
                ret.map(baseTypeName).filter(_.nonEmpty).foreach { r =>
                  refs += SymbolRef("return_type", idx, r, i.toLong, trimmed)
                }
                if (!bodyless) declaredScope = Some((idx, label, name))
                else entities(idx) = entities(idx).copy(srcEnd = i.toLong)
            }
          case _ => ()
        }

        if (!isDecl && inCallable) {
          CallRe.findAllMatchIn(trimmed).foreach { m =>
            val callee = m.group(2)
            if (!ctrlKeywords.contains(callee) && !modifiers.contains(callee))
              refs += SymbolRef("call", enclosingIdx, callee, i.toLong,
                trimmed, Arity.countArgs(trimmed, m.end - 1),
                m.group(1).stripSuffix("."))
          }
        }

        val netBraces = trimmed.count(_ == '{') - trimmed.count(_ == '}')
        declaredScope.foreach { case (idx, label, name) =>
          if (trimmed.contains('{') && netBraces <= 0) {
            // netBraces < 0: the one-liner's line ALSO closes enclosing
            // scope(s) (`void f() { g(); }}`) — the entity still completes
            // here and the outer scopes pop through the armed-scope loop
            // below; pushing a scope instead would never arm and would
            // swallow the rest of the file as body text.
            // one-line body (`int f(int x) { return g(x); }`): the scope
            // opens AND closes on the declaration line — without this the
            // scope never arms (depth never reaches closeDepth) and every
            // following declaration is swallowed as body text. Body calls
            // on the line are collected here, attributed to the new
            // entity, mirroring tree-sitter's layout-independent walk.
            if (label == "Method" || label == "Constructor") {
              val body = trimmed.substring(trimmed.indexOf('{') + 1)
              CallRe.findAllMatchIn(body).foreach { m =>
                val callee = m.group(2)
                if (!ctrlKeywords.contains(callee) && !modifiers.contains(callee))
                  refs += SymbolRef("call", idx, callee, i.toLong,
                    trimmed, Arity.countArgs(body, m.end - 1),
                    m.group(1).stripSuffix("."))
              }
            }
            entities(idx) = entities(idx).copy(srcEnd = i.toLong)
          } else {
            scopes += Scope(idx, depth + 1, label, name, armed = false)
          }
        }

        depth += netBraces
        scopes.foreach(s => if (depth >= s.closeDepth) s.armed = true)
        while (scopes.nonEmpty && scopes.last.armed &&
            depth < scopes.last.closeDepth) {
          val s = scopes.remove(scopes.size - 1)
          entities(s.idx) = entities(s.idx).copy(srcEnd = i.toLong)
        }
        lastNonEmpty = i
      }
    }
    // close any scopes left open at EOF
    scopes.reverseIterator.foreach { s =>
      entities(s.idx) = entities(s.idx).copy(srcEnd = lastNonEmpty.toLong)
    }
    FileExtraction(entities.toSeq, refs.toSeq, imports.toSeq)
  }

  /** Method/constructor declaration at type-body level:
    * (label, name, param types, return type, bodyless, arity, minArity). */
  private def parseCallable(trimmed: String,
      typeName: String): Option[(String, String, Seq[String], Option[String], Boolean, Int, Int)] = {
    val paren = trimmed.indexOf('(')
    if (paren <= 0) return None
    val pre = trimmed.substring(0, paren)
    if (pre.contains("=") || pre.contains("\"")) return None
    // strip annotations/attributes and generic argument lists (fixpoint —
    // nested generics like Map<String, List<Integer>> need repeated passes)
    val cleaned = stripGenerics(pre.replaceAll("@\\w+(\\([^)]*\\))?", " ")).trim
    val tokens = cleaned.split("\\s+").filter(_.nonEmpty).toSeq
    if (tokens.isEmpty) return None
    val name = tokens.last
    if (!name.headOption.exists(c => c.isLetter || c == '_')) return None
    if (ctrlKeywords.contains(name)) return None
    val rest = tokens.dropRight(1).filterNot(modifiers.contains)
    val close = trimmed.indexOf(')', paren)
    if (close < 0) return None
    val params = splitParams(trimmed.substring(paren + 1, close))
    val tail = trimmed.substring(close + 1)
    val bodyless = {
      val semi = tail.indexOf(';'); val brace = tail.indexOf('{')
      semi >= 0 && (brace < 0 || semi < brace)
    }
    // declaration arity counts TOP-LEVEL parameters with generic-aware
    // comma splitting — Arity.countArgs tracks ()[]{} but not <>, so
    // `Map<String, Set<Long>> in, int n` would read as 3. (Call SITES keep
    // countArgs: there `<` is usually a comparison, not a generic.)
    val parts = topLevelParts(trimmed.substring(paren + 1, close))
      .map(_.trim).filter(_.nonEmpty)
    // optional-at-the-call-site params: C# defaults (`int x = 5`), varargs
    // (Java `int... xs`, C# `params int[] xs`) — required vs total range
    // feeds the resolver's overload ranking
    val varargs = parts.exists(p => p.contains("...") || p.startsWith("params "))
    val optional = parts.count(p => p.contains("=")) + (if (varargs) 1 else 0)
    val arity = if (varargs) 99 else parts.length
    val minArity = parts.length - optional
    if (rest.isEmpty) {
      // no return type: constructor iff the name matches the enclosing type
      if (name == typeName)
        Some(("Constructor", name, params, None, bodyless, arity, minArity))
      else None
    } else {
      if (ctrlKeywords.contains(rest.last)) None
      else Some(("Method", name, params, Some(rest.last), bodyless, arity, minArity))
    }
  }

  /** Parameter TYPE names (`(parameter_list … type)` captures): for each
    * comma-separated parameter, the type token preceding the name, with
    * parameter-passing modifiers stripped. */
  /** Split on top-level commas (commas inside generics don't separate). */
  private def topLevelParts(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Nil
    val parts = ArrayBuffer.empty[String]
    var d = 0
    val cur = new StringBuilder
    s.foreach {
      case '<' => d += 1; cur.append('<')
      case '>' => d -= 1; cur.append('>')
      case ',' if d == 0 => parts += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    parts += cur.toString
    parts.toSeq
  }

  private def splitParams(s: String): Seq[String] = {
    topLevelParts(s).flatMap { p =>
      val toks = p.trim.split("\\s+").filter(_.nonEmpty)
        .filterNot(t => Set("final", "ref", "out", "in", "params", "this",
          "const", "scoped").contains(t))
      if (toks.length >= 2) Some(toks(toks.length - 2)) else None
    }
  }
}

/** Java frontend — label surface Class/Interface/Enum/Method/Constructor
  * (`api/analyzers/java/analyzer.py:40-51`); heritage: `extends` on a class
  * -> base_class, `implements` -> implement_interface, `extends` on an
  * interface -> extend_interface (`java/analyzer.py:70-95`). */
object JavaFrontend extends CFamilyFrontend {
  val language = "java"
  val extensions: Set[String] = Set(".java")

  protected val typeLabels: Map[String, String] = Map(
    "class" -> "Class", "interface" -> "Interface", "enum" -> "Enum")

  private val ExtendsRe = """extends\s+([^{]+?)(?=\bimplements\b|\{|$)""".r.unanchored
  private val ImplementsRe = """implements\s+([^{]+?)(?=\{|$)""".r.unanchored
  private val ImportRe = """^import\s+(?:static\s+)?([\w.]+)\s*;.*$""".r

  /** `import a.b.C;` binds C from package a.b (wildcard imports bind no
    * concrete name — skipped; static imports bind the member name). */
  override protected def parseImport(trimmed: String): Option[ImportDecl] =
    trimmed match {
      case ImportRe(fqn) if !fqn.endsWith(".") =>
        val segs = fqn.split("\\.")
        if (segs.length < 2 || segs.last == "*") None
        else Some(ImportDecl(segs.last, segs.dropRight(1).mkString("."),
          segs.last))
      case _ => None
    }

  protected def heritageRefs(label: String, clause: String): Seq[(String, String)] = {
    val ext = ExtendsRe.findFirstMatchIn(clause).map(_.group(1)).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val impl = ImplementsRe.findFirstMatchIn(clause).map(_.group(1)).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    label match {
      case "Interface" => ext.map("extend_interface" -> _)
      case _ => ext.map("base_class" -> _) ++ impl.map("implement_interface" -> _)
    }
  }
}

/** C# frontend — label surface adds Struct
  * (`api/analyzers/csharp/analyzer.py:32-45`); heritage is the base list
  * `: A, B` — for a class the first entry is base_class and the rest
  * implement_interface, for a struct all are implement_interface, for an
  * interface all are extend_interface (`csharp/analyzer.py:74-94`). */
object CSharpFrontend extends CFamilyFrontend {
  val language = "csharp"
  val extensions: Set[String] = Set(".cs")

  protected val typeLabels: Map[String, String] = Map(
    "class" -> "Class", "interface" -> "Interface", "enum" -> "Enum",
    "struct" -> "Struct")

  private val UsingAliasRe = """^using\s+(\w+)\s*=\s*([\w.]+)\s*;.*$""".r

  /** `using X = A.B.C;` binds X to C of namespace A.B. Plain namespace
    * `using A.B;` binds no concrete name — skipped (the resolver's
    * path-proximity heuristic covers it). */
  override protected def parseImport(trimmed: String): Option[ImportDecl] =
    trimmed match {
      case UsingAliasRe(alias, fqn) =>
        val segs = fqn.split("\\.")
        Some(ImportDecl(alias,
          if (segs.length < 2) "" else segs.dropRight(1).mkString("."),
          segs.last))
      case _ => None
    }

  protected def heritageRefs(label: String, clause: String): Seq[(String, String)] = {
    val colon = clause.indexOf(':')
    if (colon < 0) return Nil
    val bases = clause.substring(colon + 1).takeWhile(c => c != '{' && c != ';')
      .split(",").map(_.trim).filter(_.nonEmpty)
      .filterNot(_.startsWith("where ")).toSeq
    label match {
      case "Interface" => bases.map("extend_interface" -> _)
      case "Class" =>
        bases.zipWithIndex.map { case (b, i) =>
          (if (i == 0) "base_class" else "implement_interface") -> b
        }
      case _ => bases.map("implement_interface" -> _) // Struct, Enum
    }
  }
}
