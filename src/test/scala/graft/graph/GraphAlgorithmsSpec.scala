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

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxDepth: Int = 64): Map[Long, Long] = {
    import spark.implicits._
    GraphAlgorithms.bfsDistances(edges.toDF("src", "dst"), seeds.toDF("id"),
        maxDepth)
      .as[(Long, Long)].collect().toMap
  }

  test("bfs distances: min-hop on a diamond, direction respected") {
    // 1→2→4, 1→3→4, 4→5; plus a shortcut 1→4: dist(4) must be the MIN (1)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (1L, 4L))
    assert(bfs(g, Seq(1L)) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
    // edges are directed: nothing reaches 1; seeding downstream stays there
    assert(bfs(g, Seq(4L)) === Map(4L -> 0L, 5L -> 1L))
  }

  test("bfs distances: multi-source takes the nearest seed") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    val d = bfs(chain, Seq(1L, 7L))
    assert(d(4L) === 3L) // from seed 1
    assert(d(9L) === 2L) // from seed 7, not 8 hops from seed 1
    assert(d(7L) === 0L) // a seed already on the other seed's path
  }

  test("bfs distances: cycles terminate, maxDepth caps the expansion") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(bfs(cycle, Seq(1L)) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    val capped = bfs(chain, Seq(1L), maxDepth = 3)
    assert(capped.values.max === 3L)
    assert(capped.keySet === Set(1L, 2L, 3L, 4L))
    // unreachable nodes are absent, not infinite
    assert(!bfs(Seq((1L, 2L), (3L, 4L)), Seq(1L)).contains(3L))
  }

  private def core(pairs: Seq[(Long, Long)], k: Int, rounds: Int): Set[Long] = {
    import spark.implicits._
    GraphAlgorithms.kCorePeel(pairs.toDF("src", "dst"), k, rounds)
      .collect().map(_.getLong(0)).toSet
  }

  test("label propagation: two cliques with a bridge settle to two communities") {
    import spark.implicits._
    // K4 on {1..4} and K4 on {10..13} joined by one bridge 4—10: after a
    // few rounds every member holds its clique's minimum label (ties break
    // toward the smallest label, so label 1 floods clique one and label 10
    // clique two — the bridge is outvoted by the three clique neighbors)
    def k4(base: Long): Seq[(Long, Long)] =
      (for { a <- 0 to 3; b <- (a + 1) to 3 } yield (base + a, base + b)).toSeq
    val edges = (k4(1) ++ k4(10) :+ ((4L, 10L))).toDF("src", "dst")
    val got = GraphAlgorithms.labelPropagation(edges, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 4L).forall(got(_) == 1L), s"clique one: $got")
    assert((10L to 13L).forall(got(_) == 10L), s"clique two: $got")
  }

  test("LPA round-1 fast path equals the plurality rule (min neighbor id)") {
    import spark.implicits._
    // identity labels make every (v, lbl) count exactly 1, so round 1's
    // plurality argmax (max cnt, tie toward smallest label) must be the
    // minimum undirected-neighbor id — the round-17 strength reduction.
    // Mixed directions, a duplicate edge and a self-loop (dropped).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 2L), (7L, 7L),
      (9L, 5L), (2L, 1L))
    val got = GraphAlgorithms.labelPropagation(pairs.toDF("src", "dst"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val und = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val expected = und.groupBy(_._1).map { case (v, es) =>
      v -> es.map(_._2).min
    }
    assert(got === expected)
  }

  test("label propagation is partitioning-independent") {
    import spark.implicits._
    val edges = (1 to 200).map(i => (i.toLong, (i % 37).toLong + 1000))
      .toDF("src", "dst")
    val a = GraphAlgorithms.labelPropagation(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = GraphAlgorithms.labelPropagation(edges.repartition(7), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("k-core: triangle with a pendant peels to the triangle") {
    // 1-2-3 triangle plus pendant 4 off node 1: 2-core = {1,2,3}
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    assert(core(g, 2, 4) === Set(1L, 2L, 3L))
    // cascade: a CHAIN of pendants needs one round per link — 4-5 hangs
    // off the pendant; round 1 peels 5, round 2 peels 4
    val g2 = g ++ Seq((4L, 5L))
    assert(core(g2, 2, 1) === Set(1L, 2L, 3L, 4L))
    assert(core(g2, 2, 4) === Set(1L, 2L, 3L))
    // 3-core of a triangle is empty (degree 2 < 3) — survivors vanish
    assert(core(g, 3, 4) === Set.empty)
  }

  test("k-core matches brute-force peeling on a random graph") {
    val rnd = new scala.util.Random(7)
    // canonical a<b direction: the operator's degree is over the DISTINCT
    // DIRECTED edge set, so the undirected brute force needs each pair
    // present exactly once
    val edges = (1 to 200).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    def brute(k: Int): Set[Long] = {
      var adj = edges.map(e => Set(e._1, e._2)).toSet // undirected pair set
      var alive = adj.flatten
      var changed = true
      while (changed) {
        val deg = alive.map(n => n -> adj.count(_.contains(n))).toMap
        val next = alive.filter(deg(_) >= k)
        changed = next != alive
        alive = next
        adj = adj.filter(_.subsetOf(alive))
      }
      alive
    }
    Seq(2, 3, 4).foreach { k =>
      assert(core(edges, k, rounds = 40) === brute(k), s"k=$k")
    }
  }
}
