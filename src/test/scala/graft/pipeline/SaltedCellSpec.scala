package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** d14 mega-cell salt ([[Similarity.cellPairCandidates]]): triangle
  * blocking must bound per-task pairwise work under a 10×-skewed cell
  * while producing the EXACT unsalted pair set — and therefore identical
  * keep-flags. */
class SaltedCellSpec extends SparkSpec {
  import spark.implicits._

  // five 10-member cells plus one 100-member mega-cell (10× skew);
  // id/2 maps consecutive ids to identical vectors, so every cell holds
  // genuine near-dup pairs and the keep-flags are non-trivial
  private def fixture = {
    val rows = (0 until 50).map { i => (i.toLong, i / 10, i / 2) } ++
      (0 until 100).map { i => (1000L + i, 9, 500 + i / 2) }
    rows.map { case (id, cell, seed) =>
      (id, cell, Array.tabulate(4)(d => (seed * 31 + d * 7 % 11).toDouble))
    }.toDF("vec_id", "label", "embedding")
  }

  private def v = fixture.select(col("label").as("cell"),
    col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))

  test("salted candidate pairs equal the unsalted within-cell pair set, " +
    "exactly once each") {
    val salted = Similarity.cellPairCandidates(v, saltBound = 16)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(salted.size == salted.distinct.size,
      "salting emitted a duplicate pair")
    // independent unsalted reference: the plain within-cell self-join
    val a = v.select($"cell", $"id".as("id_a"))
    val b = v.select($"cell", $"id".as("id_b"))
    val ref = a.join(b, Seq("cell")).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(salted.toSet == ref,
      s"pair sets diverge: missing=${ref -- salted.toSet}, " +
        s"extra=${salted.toSet -- ref}")
  }

  test("10x-skewed cell splits into triangle blocks with bounded per-task " +
    "pair work") {
    val bound = 16
    val perBlock = Similarity.cellPairCandidates(v, bound)
      .groupBy($"cell", $"bl", $"bh").count()
      .as[(Int, Int, Int, Long)].collect()
    val mega = perBlock.filter(_._1 == 9)
    // s = ceil(100/16) = 7 -> 7*8/2 = 28 triangle blocks for the mega cell
    assert(mega.length == 28, s"expected 28 blocks, got ${mega.length}")
    // per-block pair work is bounded by ~(2n/s choose 2): block members
    // are two salt groups of ~100/7 ≈ 15 rows → ≤ ~(30·29)/2 pairs; the
    // unsalted join would put all 4950 mega-cell pairs on one task
    val maxBlock = mega.map(_._4).max
    assert(maxBlock <= 600, s"a block holds $maxBlock pairs — salt failed")
    assert(mega.map(_._4).sum == 4950L, "mega-cell pair total is off")
    // small cells stay single-block (s = 1 degenerates to the plain join)
    val small = perBlock.filter(r => r._1 != 9)
    assert(small.forall(r => r._2 == 0 && r._3 == 0))
  }

  test("keep-flags are unchanged by the salt (salted == unsalted flags)") {
    val salted = Similarity.semanticDedupFlags(fixture, 0.99,
        saltBound = 16)
      .as[(Int, Long, Boolean)].collect().toSet
    val unsalted = Similarity.semanticDedupFlags(fixture, 0.99,
        saltBound = Int.MaxValue)
      .as[(Int, Long, Boolean)].collect().toSet
    assert(salted == unsalted, "salting changed the keep-flags")
    // sanity: the fixture actually dedups (consecutive-id twins drop)
    assert(salted.exists(!_._3), "fixture produced no dropped docs")
  }
}
