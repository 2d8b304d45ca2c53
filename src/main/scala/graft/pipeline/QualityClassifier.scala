package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-n-gram linear quality/tier classifier — the CCNet / fastText
  * filter class (Joulin et al. 2017 "Bag of Tricks for Efficient Text
  * Classification"; Wenzek et al. 2020 CCNet): a linear scorer over
  * hashed word-bigram features that a 100 TB pipeline runs map-side to
  * keep or drop documents.
  *
  * The trainer is multinomial Naive Bayes, which IS a linear classifier
  * over these features and trains by pure counting — one explode + two
  * map-side-partial groupBys, no gradient loop, no driver-side state at
  * all (stronger than the usual "fit on a driver sample" posture: the
  * full corpus trains in one pass). The learned weight vector is
  * dimension-bounded (`dims` rows), so scoring is one BROADCAST join:
  * the corpus never shuffles to be scored.
  *
  * Engine-exactness (the repo's oracle conventions): the feature hash is
  * the EXPLICIT base-257 mod-1000003 polynomial over code points (the
  * d05/t07 convention — reproducible in plain SQL, engine-private hashes
  * are not) taken mod `dims`; weights are FIXED-POINT integers,
  * `round(1e6 · (ln(cpos+1) − ln(cneg+1) + ln(Nneg+dims) − ln(Npos+dims)))`
  * — every ln argument is an exact integer (ulp-identical across libm
  * per the t13-established contract) and the combination order is fixed,
  * so the rounded micro-log-odds match bit-for-bit; document scores are
  * then pure INTEGER sums (order-free under any shuffle) plus an integer
  * prior bias.
  */
object QualityClassifier {

  /** Explicit polynomial feature hash of a gram into [0, dims): base-257
    * mod-1000003 fold over code points, then mod dims. Runs the fused
    * native codepoint-walk kernel ([[graft.functions.CmsRowBuckets]] at
    * depth 1 — round-16 optimization; the interpreted HOF fold paid a
    * per-codepoint split + ascii decode); [[featureHashSpec]] keeps the
    * composable fold as the spec twin QualityClassifierSpec pins equal. */
  def featureHash(gram: Column, dims: Int): Column =
    element_at(graft.functions.CmsRowBuckets.of(gram, Seq(257L), 1000003L,
      dims.toLong), 1)

  /** The composable/spec twin of [[featureHash]] (the pre-round-16 form,
    * replayable in plain SQL — the oracle's shape). */
  def featureHashSpec(gram: Column, dims: Int): Column =
    pmod(aggregate(filter(split(gram, ""), c => c =!= ""), lit(0L),
      (acc, c) => pmod(acc * 257L + ascii(c), lit(1000003L))), lit(dims))

  /** Train on the `isTrain` slice, score EVERY document: returns
    * (idCol, label, is_train, score, pred) with `score` the integer
    * micro-log-odds and `pred` = 1 iff score ≥ 0. `label` must evaluate
    * to 0/1. */
  def nbTrainScore(docs: DataFrame, label: Column, isTrain: Column,
      dims: Int = 4096, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), label.cast("int").as("label"),
        isTrain.as("is_train"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
    val feats = base.select(col(idCol), col("label"), col("is_train"),
        explode(graft.functions.WordNGrams.wordNGramsAll(col("toks"), 2))
          .as("gram"))
      .select(col(idCol), col("label"), col("is_train"),
        featureHash(col("gram"), dims).as("f"))
    // per-feature class counts over the train slice (dims-bounded output)
    val cnt = feats.filter(col("is_train"))
      .groupBy(col("f"))
      .agg(sum(col("label")).cast("long").as("cpos"),
        sum(lit(1) - col("label")).cast("long").as("cneg"))
    val tot = cnt.agg(sum(col("cpos")).as("npos"), sum(col("cneg")).as("nneg"))
    // fixed-point NB log-odds: fixed ln combination order (oracle parity)
    val weights = cnt.crossJoin(broadcast(tot))
      .select(col("f"),
        round(lit(1000000.0) *
          (log(col("cpos") + 1) - log(col("cneg") + 1) +
            log(col("nneg") + dims) - log(col("npos") + dims)))
          .cast("long").as("w"))
    val bias = base.filter(col("is_train"))
      .agg(round(lit(1000000.0) *
        (log(count(when(col("label") === 1, 1)) + 1) -
          log(count(when(col("label") === 0, 1)) + 1)))
        .cast("long").as("bias"))
    // scoring: broadcast the dims-bounded weight vector; integer sums
    val perDoc = feats
      .join(broadcast(weights), Seq("f"), "left_outer")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w"), lit(0L))).as("s"))
    base.select(col(idCol), col("label"), col("is_train"))
      .join(perDoc, Seq(idCol), "left_outer")
      .crossJoin(broadcast(bias))
      .select(col(idCol), col("label"), col("is_train"),
        (col("bias") + coalesce(col("s"), lit(0L))).as("score"))
      .withColumn("pred", when(col("score") >= 0, 1).otherwise(0))
  }
}
