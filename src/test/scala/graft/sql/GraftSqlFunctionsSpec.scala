package graft.sql

import java.nio.file.Files

import graft.SparkSpec
import graft.graph.{CodeGraph, GraphStore}
import graft.ingest.Ingestor
import graft.pipeline.{Dedup, TextAnalysis}

import org.apache.spark.sql.functions._

/** SQL surface: the native kernels registered as SQL functions must agree
  * with their Column formulations, and graph views must answer label
  * queries from plain SQL. */
class GraftSqlFunctionsSpec extends SparkSpec {

  private lazy val registered = { GraftSqlFunctions.register(spark); true }

  test("SQL kernels agree with their Column formulations") {
    assert(registered)
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sfTiny).limit(50)
    docs.createOrReplaceTempView("sql_docs")

    val viaSql = spark.sql(
      """SELECT doc_id, graft_ngrams(lower(text), 3) AS grams,
        |  graft_fingerprint(text) AS fp
        |FROM sql_docs""".stripMargin)
    val viaCol = docs.select($"doc_id",
      Dedup.ngrams(lower($"text"), 3).as("grams"),
      TextAnalysis.fingerprint($"text").as("fp"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)

    val sig = spark.sql(
      """SELECT graft_minhash_sig(graft_ngrams(lower(text), 3), 16) AS sig,
        |  graft_simhash64(array_distinct(split(lower(trim(text)), '\\s+'))) AS sh
        |FROM sql_docs""".stripMargin).collect()
    assert(sig.forall(_.getAs[scala.collection.Seq[Long]]("sig").size == 16))

    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val win = spark.sql(
      """SELECT graft_winnowing(text, 8, 4) AS fp FROM sql_docs LIMIT 5""")
      .collect()
    assert(win.forall(_.getAs[scala.collection.Seq[Long]]("fp").nonEmpty))

    // PQ: a vector equal to the second centroid of each subspace encodes
    // to [1, 1], and the ADC lookup sums the addressed LUT cells
    val pq = spark.sql(
      """SELECT graft_pq_encode(array(1.0d, 1.0d, 5.0d, 5.0d),
        |  array(array(array(0.0d, 0.0d), array(1.0d, 1.0d)),
        |        array(array(9.0d, 9.0d), array(5.0d, 5.0d)))) AS codes,
        |  graft_pq_adc(array(array(0.5d, 1.5d), array(2.0d, 4.0d)),
        |    array(1, 0)) AS adist""".stripMargin).head()
    assert(pq.getAs[scala.collection.Seq[Int]]("codes").toSeq === Seq(1, 1))
    assert(pq.getDouble(1) === 3.5)

    // degenerate geometry returns NULL per the contract, never throws
    // or reads out of bounds: empty codebook, empty subspace, ragged
    // centroid, out-of-range ADC code
    val nulls = spark.sql(
      """SELECT
        |  graft_pq_encode(array(1.0d),
        |    cast(array() as array<array<array<double>>>)) AS c1,
        |  graft_pq_encode(array(1.0d),
        |    array(cast(array() as array<array<double>>))) AS c2,
        |  graft_pq_encode(array(1.0d, 2.0d),
        |    array(array(array(0.0d, 0.0d), array(1.0d)))) AS c3,
        |  graft_pq_adc(array(array(0.5d)), array(3)) AS c4""".stripMargin)
      .head()
    (0 to 3).foreach(i => assert(nulls.isNullAt(i), s"col $i must be NULL"))
  }

  test("graph views answer label queries from SQL") {
    assert(registered)
    val wh = Files.createTempDirectory("graft-sql-wh").toString
    val store = new GraphStore(spark, wh)
    val g = new CodeGraph(spark, "sqlproj", Some(store))
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("m.py", Seq(
      "def f():",
      "    g()",
      "",
      "def g():",
      "    pass").mkString("\n"))))
    g.checkpointNow(); g.save()
    GraftSqlFunctions.registerGraphViews(spark, store, "sqlproj")
    val fns = spark.sql(
      """SELECT n.name FROM sqlproj_nodes n
        |WHERE graft_has_label(n.labels, 'Function')
        |ORDER BY n.name""".stripMargin).collect().map(_.getString(0))
    assert(fns.toSeq == Seq("f", "g"))
    val calls = spark.sql(
      """SELECT a.name AS caller, b.name AS callee
        |FROM sqlproj_edges e
        |JOIN sqlproj_nodes a ON e.src = a.id
        |JOIN sqlproj_nodes b ON e.dst = b.id
        |WHERE e.type = 'CALLS'""".stripMargin).collect()
    assert(calls.length == 1)
    assert(calls(0).getString(0) == "f" && calls(0).getString(1) == "g")
  }
}
