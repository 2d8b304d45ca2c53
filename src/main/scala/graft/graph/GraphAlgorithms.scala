package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over plain edge lists — operators the
  * reference's FalkorDB backend would run as GraphBLAS kernels, expressed
  * as DataFrame programs.
  */
object GraphAlgorithms {

  /** Exact triangle count of the undirected graph given as a pair list.
    *
    * Node-iterator with DEGREE ORIENTATION (Suri & Vassilvitskii, WWW'11
    * "Counting Triangles and the Curse of the Last Reducer"): every edge is
    * oriented from its lower-(degree, id) endpoint to the higher one, so a
    * triangle is counted exactly once — at its minimum-key vertex — and,
    * crucially, the per-node out-degree is O(√m), which bounds the wedge
    * fan-out that kills the naive id-oriented plan on skewed graphs (a hub
    * node with degree d would otherwise emit d²/2 wedges on one reducer).
    *
    * Three shuffles total: degree count, wedge self-join on the apex,
    * closing-edge semi-join. Exact integer output — oracle-friendly. */
  def triangleCount(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
      .localCheckpoint(true) // read by the degree count AND the orientation
    val deg = e.select(explode(array(col("x"), col("y"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val oriented = e
      .join(deg.select(col("n").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("n").as("y"), col("deg").as("dy")), "y")
      .select(when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
        struct(col("x").as("lo"), col("y").as("hi"),
          struct(col("dy").as("d"), col("y").as("n")).as("hikey")))
        .otherwise(struct(col("y").as("lo"), col("x").as("hi"),
          struct(col("dx").as("d"), col("x").as("n")).as("hikey")))
        .as("o"))
      .select(col("o.lo").as("lo"), col("o.hi").as("hi"),
        col("o.hikey").as("hikey"))
      .localCheckpoint(true) // both wedge sides + the closing join read it
    val w1 = oriented.select(col("lo"), col("hi").as("h1"),
      col("hikey").as("k1"))
    val w2 = oriented.select(col("lo"), col("hi").as("h2"),
      col("hikey").as("k2"))
    // wedge at apex lo with ends ordered by orientation key: the closing
    // edge, if present, is oriented h1 -> h2 (k1 < k2), so one semi-join
    // decides each wedge and every triangle is counted exactly once
    val wedges = w1.join(w2, Seq("lo"))
      .filter(col("k1") < col("k2"))
      .select(col("h1").as("lo"), col("h2").as("hi"))
    wedges.join(oriented.select(col("lo"), col("hi")), Seq("lo", "hi"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
