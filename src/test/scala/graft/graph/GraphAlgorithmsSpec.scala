package graft.graph

import graft.SparkSpec

class GraphAlgorithmsSpec extends SparkSpec {

  private def count(pairs: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    GraphAlgorithms.triangleCount(pairs.toDF("a", "b"))
      .head().getLong(0)
  }

  test("triangle count: known graphs") {
    // K4 has C(4,3) = 4 triangles; duplicate/reversed/self edges ignored
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 3L))
    assert(count(k4) == 4)
    // a path has none
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0)
    // hub star + one closing rim edge = exactly 1 triangle, and the skewed
    // hub exercises the degree orientation (rim nodes emit the wedges)
    val star = (2L to 12L).map(i => (1L, i)) :+ ((2L, 3L))
    assert(count(star) == 1)
    // empty edge list
    assert(count(Seq.empty) == 0)
  }

  test("fixed-point pagerank: sinks outrank sources, deterministic") {
    import spark.implicits._
    // star pointing INTO the hub: hub must outrank every leaf
    val star = (2L to 8L).map(i => (i, 1L)).toDF("src", "dst")
    val r = GraphAlgorithms.pageRankFixed(star, iters = 10)
      .as[(Long, Long)].collect().toMap
    assert((2L to 8L).forall(i => r(1L) > r(i)))
    // leaves have no incoming mass: exactly the (1-d) floor
    assert((2L to 8L).forall(i => r(i) == 150000L))
    // bit-determinism across runs
    val r2 = GraphAlgorithms.pageRankFixed(star, iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(r == r2)
  }

  test("triangle count matches brute-force enumeration on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val set = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    val brute = (for {
      Seq(x, y, z) <- set.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
        .combinations(3)
      if set((x, y)) && set((x, z)) && set((y, z))
    } yield 1).size
    assert(count(edges) == brute)
  }
}
