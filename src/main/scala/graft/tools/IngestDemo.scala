package graft.tools


import graft.graph.{CodeGraph, GraphQueries}
import graft.ingest.Ingestor

/** Library-surface ingest demo: parse Python source end-to-end into a code
  * graph and answer the reference's golden queries. */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")

    val src = Seq(
      "# fixture", "",
      "def log(msg):", "    print(msg)", "",
      "class Task:",
      "    def __init__(self, name, duration):",
      "        self.name = name",
      "        print(name)", "",
      "    def abort(self, delay):",
      "        log(\"abort\")",
      "        return self").mkString("\n")

    val g = new CodeGraph(spark, "demo")
    val report = Ingestor.ingest(g, Seq(Ingestor.SourceFile("src.py", src)))
    println(s"ingested: $report")
    println("== function_called_by(print) — golden: [__init__, log] ==")
    GraphQueries.functionCalledBy(g.graph, "print").show(false)
    println("== entities ==")
    g.graph.nodes.orderBy("id").show(20, truncate = false)
    println("== edges ==")
    g.graph.edges.orderBy("src", "dst").show(20, truncate = false)
    spark.stop()
  }
}
