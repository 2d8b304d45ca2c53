package graft.tools

import org.apache.spark.sql.functions._

import graft.graph.{CodeGraph, Mutations}
import graft.util.Tables

/** Phase breakdown of the g08 gate (heaviest bench query): bulk build
  * (addFiles / addEntities / connectEntities), checkpoint, DEFINES*
  * cascade delete, final aggregation — each timed per rep so the
  * build-vs-cascade attribution and the rep-to-rep variance are measured,
  * not guessed. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  *     sbt "runMain graft.tools.ProfileG08"
  */
object ProfileG08 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = graft.util.Sessions.local(32)
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[g08] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"[g08] === rep $rep ===")
      System.gc(); Thread.sleep(500); System.gc()
      val t0 = System.nanoTime()
      val g = new CodeGraph(spark, s"g08prof$rep")
      val files = Tables.orders(spark, sfDir).select(
        lit("orders").as("path"),
        $"o_orderkey".cast("string").as("name"), lit(".ord").as("ext"))
      val fileIds = time("addFiles") {
        g.addFiles(files).result
          .select($"id".as("file_id"), $"name".as("okey"))
      }
      val ents = Tables.lineitem(spark, sfDir).select(
        lit("Function").as("label"),
        concat($"l_orderkey", lit("#"), $"l_linenumber").as("name"),
        $"l_orderkey".cast("string").as("path"),
        $"l_linenumber".cast("long").as("src_start"),
        $"l_linenumber".cast("long").as("src_end"),
        lit("").as("doc"), map().cast("map<string,string>").as("props"))
      val entIds = time("addEntities") {
        g.addEntities(ents).result
          .select($"id".as("ent_id"), $"path".as("okey"))
      }
      time("connectEntities") {
        g.connectEntities(fileIds.join(entIds, "okey")
          .select($"file_id".as("src"), $"ent_id".as("dst"),
            lit("DEFINES").as("type"),
            map().cast("map<string,string>").as("props")))
      }
      time("checkpointNow") { g.checkpointNow() }
      val victims = Tables.orders(spark, sfDir)
        .filter($"o_orderstatus" === "F")
        .select(lit("orders").as("path"),
          $"o_orderkey".cast("string").as("name"), lit(".ord").as("ext"))
      val res = time("deleteFiles cascade") {
        Mutations.deleteFiles(g.graph, victims)
      }
      time("final aggregation") {
        val nodeCounts = res.graph.nodes
          .select(element_at($"labels", 1).as("kind"))
          .groupBy($"kind").agg(count(lit(1)).as("n"))
        val edgeCount = res.graph.edges.agg(count(lit(1)).as("n"))
          .withColumn("kind", lit("edges")).select($"kind", $"n")
        nodeCounts.unionByName(edgeCount).orderBy($"kind").count()
      }
      println(f"[g08] TOTAL rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
