package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.graph.{CodeGraph, GraphQueries}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental ingest: micro-batches of changed files must keep
  * the graph current — updates replace a file's entities and rewire its
  * call edges, with IDs still assigned by the batch mutation engine. */
class StreamingIngestSpec extends SparkSpec {

  test("file updates stream into the graph; stale entities are replaced") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val g = new CodeGraph(spark, "stream_ingest")
    val in = MemoryStream[(String, String)]
    val files = in.toDF().toDF("path", "source")
    val ckpt = Files.createTempDirectory("graft-si-ckpt").toString
    val q = StreamingIngest.start(g, files, ckpt)
    try {
      // batch 1: f calls helper_one
      in.addData(("mod.py", Seq(
        "def f():",
        "    helper_one()",
        "",
        "def helper_one():",
        "    pass").mkString("\n")))
      q.processAllAvailable()
      val after1 = g.graph.nodes
        .filter(array_contains($"labels", "Function") && $"path" === "mod.py")
        .select($"name").as[String].collect().toSet
      assert(after1 == Set("f", "helper_one"))
      val calls1 = GraphQueries.functionCalls(g.graph, "f")
        .select(explode($"callees")).as[String].collect().toSet
      assert(calls1 == Set("helper_one"))

      // batch 2: the SAME file now defines f calling helper_two
      in.addData(("mod.py", Seq(
        "def f():",
        "    helper_two()",
        "",
        "def helper_two():",
        "    pass").mkString("\n")))
      q.processAllAvailable()
      val after2 = g.graph.nodes
        .filter(array_contains($"labels", "Function") && $"path" === "mod.py")
        .select($"name").as[String].collect().toSet
      assert(after2 == Set("f", "helper_two"), "stale entities not replaced")
      val calls2 = GraphQueries.functionCalls(g.graph, "f")
        .select(explode($"callees")).as[String].collect().toSet
      assert(calls2 == Set("helper_two"), "stale call edge survived")

      // a second file arrives; cross-file call resolves against the graph
      in.addData(("other.py", Seq(
        "def g():",
        "    f()").mkString("\n")))
      q.processAllAvailable()
      val fCallers = GraphQueries.functionCalledBy(g.graph, "f")
        .select(explode($"callers")).as[String].collect().toSet
      assert(fCallers == Set("g"))
    } finally q.stop()
  }
}
