package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, Expression,
  ExpressionInfo, Literal, Lower, RegExpReplace, StringTrim, XxHash64}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CdcChunks, CharNGrams, CosineSimilarity,
  HyperplaneSignature, MinHashSignature, PqAdcDistance, PqEncodeCodes,
  SimHash64, WinnowingFingerprints, WordNGrams}
import graft.graph.GraphStore

/** SQL surface for graft's native kernels and graph tables.
  *
  * Registers the fused Catalyst expressions as SQL functions so the whole
  * pipeline-operator family is usable from `spark.sql(...)` — the reference
  * exposes its surface as Cypher strings; ours is DataFrame-first with SQL
  * as an equal citizen:
  *
  *  - `graft_has_label(labels, 'Class')` — multi-label test (sugar over
  *    array_contains, the §1.6 labels mapping)
  *  - `graft_ngrams(text, n)` — fused char n-gram shingles
  *  - `graft_word_ngrams(tokens, n[, distinct])` — fused word n-grams
  *  - `graft_minhash_sig(grams, k)` — fused MinHash signature
  *  - `graft_simhash64(tokens)` — fused 64-bit SimHash
  *  - `graft_hyperplane_sig(vec, bits)` — random-hyperplane LSH signature
  *  - `graft_cosine(a, b)` — codegen'd cosine similarity
  *  - `graft_pq_encode(vec, codebook)` — PQ nearest-centroid codes
  *  - `graft_pq_adc(lut, codes)` — PQ asymmetric-distance lookup sum
  *  - `graft_cdc_chunks(text, k, divisor)` — content-defined chunk spans
  *  - `graft_fingerprint(text)` — normalized-content xxhash64 fingerprint
  *
  * Two wiring paths: `GraftSqlFunctions.register(spark)` injects into a
  * live session's FunctionRegistry; `graft.sql.GraftExtensions` is the
  * `spark.sql.extensions` entry point for config-time injection on every
  * session of a cluster.
  */
object GraftSqlFunctions {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  /** (identifier, info, builder) triples in the shape
    * `SparkSessionExtensions.injectFunction` consumes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_has_label"),
      new ExpressionInfo(classOf[ArrayContains].getName, "graft_has_label"),
      (args: Seq[Expression]) => args match {
        case Seq(arr, l) => ArrayContains(arr, l)
        case _ => throw new IllegalArgumentException(
          "graft_has_label(labels, label)")
      }),
    (FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "graft_ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => CharNGrams(text, litInt(n, "graft_ngrams"))
        case _ => throw new IllegalArgumentException("graft_ngrams(text, n)")
      }),
    (FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "graft_word_ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, n) =>
          WordNGrams(toks, litInt(n, "graft_word_ngrams"), distinct = true)
        case Seq(toks, n, Literal(d: Boolean, _)) =>
          WordNGrams(toks, litInt(n, "graft_word_ngrams"), distinct = d)
        case _ => throw new IllegalArgumentException(
          "graft_word_ngrams(tokens, n[, distinct])")
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(grams, k) =>
          MinHashSignature(grams, litInt(k, "graft_minhash_sig"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_sig(grams, numHashes)")
      }),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(tokens)
        case _ => throw new IllegalArgumentException("graft_simhash64(tokens)")
      }),
    (FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName,
        "graft_hyperplane_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(vec, bits) =>
          HyperplaneSignature(vec, litInt(bits, "graft_hyperplane_sig"))
        case _ => throw new IllegalArgumentException(
          "graft_hyperplane_sig(vec, nPlanes)")
      }),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSimilarity(a, b)
        case _ => throw new IllegalArgumentException("graft_cosine(a, b)")
      }),
    (FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncodeCodes].getName, "graft_pq_encode"),
      (args: Seq[Expression]) => args match {
        case Seq(vec, cb) => PqEncodeCodes(vec, cb)
        case _ => throw new IllegalArgumentException(
          "graft_pq_encode(vec, codebook)")
      }),
    (FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcDistance].getName, "graft_pq_adc"),
      (args: Seq[Expression]) => args match {
        case Seq(lut, codes) => PqAdcDistance(lut, codes)
        case _ => throw new IllegalArgumentException(
          "graft_pq_adc(lut, codes)")
      }),
    (FunctionIdentifier("graft_winnowing"),
      new ExpressionInfo(classOf[WinnowingFingerprints].getName,
        "graft_winnowing"),
      (args: Seq[Expression]) => args match {
        case Seq(text, k, w) => WinnowingFingerprints(text,
          litInt(k, "graft_winnowing"), litInt(w, "graft_winnowing"))
        case _ => throw new IllegalArgumentException(
          "graft_winnowing(text, k, w)")
      }),
    (FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (args: Seq[Expression]) => args match {
        case Seq(text, k, d) => CdcChunks(text,
          litInt(k, "graft_cdc_chunks"), litInt(d, "graft_cdc_chunks"))
        case _ => throw new IllegalArgumentException(
          "graft_cdc_chunks(text, k, divisor)")
      }),
    (FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[XxHash64].getName, "graft_fingerprint"),
      (args: Seq[Expression]) => args match {
        // xxhash64(regexp_replace(lower(trim(text)), '\s+', ' ')) — the
        // same normalization as TextAnalysis.fingerprint
        case Seq(text) => XxHash64(
          Seq(RegExpReplace(Lower(StringTrim(text)),
            Literal("\\s+"), Literal(" "))), 42L)
        case _ => throw new IllegalArgumentException("graft_fingerprint(text)")
      }))

  /** Inject every graft function into a live session. */
  def register(spark: SparkSession): Unit = functions.foreach {
    case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Register a repo's graph as SQL views `<repo>_nodes` / `<repo>_edges`
    * (the §1.6 mapping's "SQL views from day one"). */
  def registerGraphViews(spark: SparkSession, store: GraphStore,
      repo: String): Unit = {
    val g = store.load(repo)
    g.nodes.createOrReplaceTempView(s"${repo}_nodes")
    g.edges.createOrReplaceTempView(s"${repo}_edges")
  }
}

/** `spark.sql.extensions=graft.sql.GraftExtensions` — config-time function
  * injection for every session (the SparkSessionExtensions path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.functions.foreach(ext.injectFunction)
}
