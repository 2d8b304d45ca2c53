package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the count-min sketch (Cormode &
  * Muthukrishnan 2005), the 100 TB answer to "how often does each of
  * these keys occur" when a full distinct-key aggregation is too wide to
  * keep: the sketch is a FIXED d×w counter grid regardless of corpus
  * size, partial grids from any split of the data SUM into the grid of
  * the whole (mergeability is the entire point — map-side partials,
  * per-day sketches, per-source sketches all combine by addition), and a
  * point estimate `min_j grid[j][h_j(key)]` never under-counts.
  *
  * Unlike the q13 sketches (engine-private HLL/KLL internals, contract
  * oracle), every number here is deterministic and cross-engine exact:
  * the row hashes are the repo's d13 polynomial family — fold the key's
  * codepoints through `acc·base_j + c (mod 2³¹−1)` then mod the width —
  * which DuckDB replays verbatim with `ord` + `list_reduce`, so the
  * whole sketch (and every estimate) is full-value oracle-checkable. */
object Sketches {

  /** Counter-grid depth (independent hash rows) and width. d=4, w=1024
    * bounds the over-count at ε ≈ e/w of the total mass per row with
    * failure probability e^−d — and keeps the grid (≤4096 rows)
    * broadcastable forever. */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** One polynomial base per row — pairwise distinct, the d13/t04 hash
    * family (257 and 131 are its established members). */
  val RowBases: Seq[Long] = Seq(257L, 131L, 193L, 31L)
  val HashPrime = 2147483647L // 2³¹−1, the d13 modulus

  /** Row-`j` bucket of a string column: the codepoint fold mod the
    * prime, mod the width. `split("")` + `ascii` walks codepoints (the
    * established corpus split semantics); the fold is the exact shape
    * DuckDB's `list_reduce` over `ord` replays.
    *
    * Kept as the composable/spec twin: the hot paths ([[cmsBuild]],
    * [[cmsEstimate]]) run [[graft.functions.CmsRowBuckets]], the fused
    * one-walk kernel SketchesSpec pins bucket-for-bucket equal to this
    * form (round-16 optimization — the per-j HOF fold re-split the key
    * and re-decoded every codepoint `CmsDepth` times per occurrence). */
  def cmsBucket(key: Column, j: Int): Column =
    pmod(aggregate(filter(split(key, ""), c => c =!= ""),
      lit(0L), (acc, c) =>
        pmod(acc * lit(RowBases(j)) + ascii(c), lit(HashPrime))),
      lit(CmsWidth.toLong))

  /** All `CmsDepth` row buckets of a key in one codepoint walk (the
    * fused kernel behind the hot paths). */
  def cmsBuckets(key: Column): Column =
    graft.functions.CmsRowBuckets.of(key, RowBases.take(CmsDepth),
      HashPrime, CmsWidth.toLong)

  /** Build the sketch of a corpus' word OCCURRENCES: one explode, one
    * (row, bucket)-keyed aggregation whose state is capped at d×w
    * counters per partition (map-side combine makes the shuffle
    * d×w-bounded no matter the corpus). Returns the SPARSE grid
    * (j, bucket, cnt) — absent buckets are zero. Grids over any
    * partition of the corpus merge by summing `cnt` (spec-pinned).
    *
    * STREAM-LEGAL, and unusually so: the same plan runs as a Structured
    * Streaming aggregation whose state is the grid itself — the one
    * stateful stream whose state CANNOT grow with the stream (≤ d×w
    * counters, no watermark needed, nothing to expire). A sketch over
    * an unbounded arrival firehose is exactly the production use;
    * StreamingSpec pins the streamed grid equal to the batch grid over
    * the union of all arrivals, across multiple micro-batches. */
  def cmsBuild(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = wordOccurrences(docs, textCol)
    // the bucket vector is a REAL attribute in its own Project (the t46
    // two-Project lesson: CollapseProject will not inline a non-cheap
    // alias referenced CmsDepth times), so the kernel runs once per
    // occurrence and the explode reads plain array slots
    toks.select(cmsBuckets(col("word")).as("_jbs"))
      .select(explode(array((0 until CmsDepth).map(j =>
        struct(lit(j).as("j"),
          element_at(col("_jbs"), j + 1).as("bucket"))): _*))
        .as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** One row per word OCCURRENCE of the corpus — the tokenization
    * posture shared by the grid builder, the q40 gate's exact top-k and
    * the spec, factored for the same reason the oracle side factors
    * `cmsChainSql`: a posture change must not drift the copies apart. */
  def wordOccurrences(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")

  /** Point estimates for a set of keys: `min_j grid[j][h_j(key)]` — the
    * grid (≤ d×w rows by construction) broadcasts unconditionally, the
    * key side never shuffles. A key the corpus never produced can miss
    * every bucket; COALESCE(…, 0) keeps the estimate total.
    *
    * The probe/grid plumbing columns live in a reserved `_cms_*`
    * namespace so caller columns named `j`/`bucket`/`cnt` cannot collide
    * with the join keys or be mis-grouped; `_cms_*` caller columns are
    * rejected up front rather than silently shadowed. */
  def cmsEstimate(cms: DataFrame, keys: DataFrame,
      keyCol: String = "word"): DataFrame = {
    require(!keys.columns.exists(_.startsWith("_cms_")),
      "keys frame uses the reserved _cms_ column namespace")
    val grid = cms.select(col("j").as("_cms_j"),
      col("bucket").as("_cms_bucket"), col("cnt").as("_cms_cnt"))
    val probes = keys.select(col("*"),
        cmsBuckets(col(keyCol)).as("_cms_jbs"))
      .select(col("*"),
        explode(array((0 until CmsDepth).map(j =>
          struct(lit(j).as("_cms_j"),
            element_at(col("_cms_jbs"), j + 1).as("_cms_bucket"))): _*))
          .as("_cms_jb"))
      .select(col("*"), col("_cms_jb._cms_j").as("_cms_j"),
        col("_cms_jb._cms_bucket").as("_cms_bucket"))
      .drop("_cms_jb", "_cms_jbs")
    probes.join(broadcast(grid), Seq("_cms_j", "_cms_bucket"), "left_outer")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("_cms_cnt"), lit(0L))).as("est_cnt"))
  }
}
