package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GPT-2-exact PRETOKENIZATION — the tiktoken/GPT-2 split regex
  * (Radford et al. 2019; the `gpt2` pattern published in OpenAI's
  * tiktoken registry): contractions (`'s 't 're 've 'm 'll 'd`),
  * optionally-space-prefixed letter runs, digit runs and punctuation
  * runs, and whitespace runs that DONATE their final space to a
  * following word (`\s+(?!\S)`). Unlike the whitespace pretokenization
  * the char/byte tokenizer gates use ([[graft.pipeline.TextAnalysis
  * .tokens]] lowercases and drops separators — decode is a normal
  * form), GPT-2 pieces preserve case and whitespace and CONCATENATE
  * BACK TO THE INPUT EXACTLY — `detok ∘ tok` becomes the identity
  * (the t46 gate), and graft's byte-BPE token streams segment text the
  * way a real GPT-2 tokenizer does.
  *
  * RE2 DISCIPLINE: the published pattern's `\s+(?!\S)` negative
  * lookahead does not exist in RE2 (the DuckDB oracle's engine), so
  * this implementation matches a LOOKAHEAD-FREE variant (plain `\s+`
  * last) and then applies the algebraic fix-up: a whitespace run
  * followed by a non-space token always yields run-minus-last-char
  * first, then the last char — fused onto the next token iff it is a
  * literal space (which is exactly what greedy-plus-lookahead
  * produces; see the branch notes on [[pretokenize]]). Whitespace is
  * the PYTHON `\s` set spelled as an explicit class (Java's `\s` is
  * ASCII-only, RE2's omits `\x0B` — the explicit class is the only
  * spelling all three engines agree on, and it is the set the real
  * GPT-2 tokenizer uses).
  *
  * Reference scope: the reference backend has no tokenizers — this is
  * part of the LLM-data-pipeline extension surface.
  */
object Gpt2 {

  /** Python-regex `\s` for str, spelled explicitly ([ \t\n\r\f\v] plus
    * the Unicode whitespace codepoints) — identical in Java regex and
    * RE2 (`\x{…}` escapes parse in both; `\u` would not parse in RE2). */
  val WsClass: String =
    "\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}" +
      "\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}"

  /** A whole-token whitespace-run test. */
  val WsRunRe: String = s"^[$WsClass]+$$"

  /** The lookahead-free GPT-2 split pattern (alternation order is the
    * published one; the final `\s+` replaces `\s+(?!\S)|\s+`). */
  val SplitRe: String =
    "'s|'t|'re|'ve|'m|'ll|'d" +
      s"| ?\\p{L}+| ?\\p{N}+| ?[^$WsClass\\p{L}\\p{N}]+|[$WsClass]+"

  val Contractions: Seq[String] =
    Seq("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")

  /** GPT-2 pieces of `text` as array<string>, concatenating back to
    * `text` exactly. One codegen'd expression: the raw split plus the
    * lookahead fix-up as a `transform` over token indexes (each output
    * depends on at most the two previous and one following raw token).
    *
    * Fix-up branches (t46's planted rows pin each one; W = a raw
    * whitespace token, derived from how greedy-`\s+(?!\S)` backtracks):
    *  1. W followed by anything → emit W minus its last char, then the
    *     last char alone UNLESS it is a literal space (a space fuses
    *     onto the next token; `' ?'` in the pattern is a literal space,
    *     so a donated tab/newline stands alone). Trailing W (end of
    *     text) is emitted whole — the lookahead passes at end-of-input.
    *  2. a donated space before one of the seven contractions does NOT
    *     produce `" '" + contraction`: GPT-2's `' ?[^\s\p{L}\p{N}]+'`
    *     eats `" '"` and the contraction's letters fall into the NEXT
    *     letter run — so emit `" '"`, and the contraction's letter tail
    *     either stands alone or (branch 3) prefixes a directly-
    *     following letter run.
    *  3. the letter run directly after a donated-space contraction
    *     absorbs that contraction's letter tail (`" 'sa"` → `" '"`,
    *     `"sa"`).
    *  4. a donated space before any other token fuses onto it.
    */
  def pretokenize(text: Column): Column =
    fixup(rawSplit(text))

  /** The raw lookahead-free split. */
  def rawSplit(text: Column): Column =
    regexp_extract_all(text, lit(SplitRe), lit(0))

  /** [[pretokenize]] as a two-projection DataFrame transform — the
    * CORPUS-PATH form. The fix-up lambda references its input array up
    * to six times per element (the neighbor lookups), and expression
    * evaluation inside a higher-order function does NOT share
    * subexpressions — composing the fix-up directly over the split
    * expression re-runs the split REGEX per element per reference,
    * quadratic in document length (measured: the one-projection form
    * held t46 at ~13 s at sf0.1; this form cut the split cost to one
    * regex pass). Two Projects with the raw array as a real attribute
    * keep the regex at once-per-row (CollapseProject does not inline a
    * non-cheap alias referenced more than once). [[pretokenize]] stays
    * the convenience form for single-pass/spec use. */
  def pretokenized(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, outCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), rawSplit(col(textCol)).as("_gpt2_raw"))
      .select(col(idCol), fixup(col("_gpt2_raw")).as(outCol))

  /** The lookahead fix-up over an already-materialized raw-split array
    * (see [[pretokenized]] for why the argument should be a plain
    * attribute on corpus paths). */
  def fixup(a: Column): Column = {
    val out = flatten(transform(a, (x, i) => {
      val n = size(a)
      val isWs = x.rlike(WsRunRe)
      val last = x.substr(length(x), lit(1))
      val head = x.substr(lit(1), length(x) - 1)
      val prev = get(a, i - 1)
      val prevPrev = get(a, i - 2)
      val nxt = get(a, i + 1)
      def donates(t: Column): Column =
        coalesce(t.rlike(WsRunRe) && t.endsWith(" "), lit(false))
      val isContraction = x.isin(Contractions: _*)
      val prevIsContraction =
        coalesce(prev.isin(Contractions: _*), lit(false))
      val nextIsLetter = coalesce(nxt.rlike("^\\p{L}"), lit(false))
      when(isWs && i < n - 1,
          when(last === " ", array(head)).otherwise(array(head, last)))
        .when(donates(prev) && isContraction,
          when(nextIsLetter, array(lit(" '")))
            .otherwise(array(lit(" '"), x.substr(lit(2), length(x)))))
        .when(donates(prevPrev) && prevIsContraction &&
            x.rlike("^\\p{L}"),
          array(concat(prev.substr(lit(2), length(prev)), x)))
        .when(donates(prev), array(concat(lit(" "), x)))
        .otherwise(array(x))
    }))
    filter(out, p => p =!= lit(""))
  }

  /** Driver-side mirror of [[pretokenize]] — the spec cross-check and
    * the seam for local kernels; byte-for-byte the same raw split
    * (Java regex on the same pattern) and the same fix-up. */
  def pretokenizeLocal(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(SplitRe).matcher(text)
    val raw = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) raw += m.group()
    val wsRun = java.util.regex.Pattern.compile(WsRunRe)
    def isWs(s: String): Boolean = wsRun.matcher(s).find()
    def donates(i: Int): Boolean =
      i >= 0 && isWs(raw(i)) && raw(i).endsWith(" ")
    def letterStart(s: String): Boolean =
      s.nonEmpty && Character.isLetter(s.codePointAt(0))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    raw.indices.foreach { i =>
      val x = raw(i)
      if (isWs(x) && i < raw.length - 1) {
        if (x.length > 1) out += x.substring(0, x.length - 1)
        if (!x.endsWith(" ")) out += x.substring(x.length - 1)
      } else if (donates(i - 1) && Contractions.contains(x)) {
        out += " '"
        if (!(i + 1 < raw.length && letterStart(raw(i + 1))))
          out += x.substring(1)
      } else if (i >= 2 && donates(i - 2) &&
          Contractions.contains(raw(i - 1)) && letterStart(x)) {
        out += raw(i - 1).substring(1) + x
      } else if (donates(i - 1)) {
        out += " " + x
      } else out += x
    }
    out.toSeq
  }
}
