package graft.tools


import graft.graph._

/** Library-surface demo: builds the FIXTURES.md §1.1 python fixture graph
  * through the public API, runs the reference's golden queries, exercises
  * persistence + time travel, and prints what it sees. Used for manual
  * end-to-end verification (`java -cp ... graft.tools.GraphDemo <warehouse>`). */
object GraphDemo {
  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse("/tmp/graft-demo-warehouse")
    val spark = graft.util.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, utc = true)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val store = new GraphStore(spark, warehouse)
    val g = new CodeGraph(spark, "pyfixture")
    g.addFiles(Seq(("", "src.py", ".py")).toDF("path", "name", "ext"))
    g.addEntities(Seq(
      ("Function", "log", "src.py", 2L, 3L, "", Map.empty[String, String]),
      ("Class", "Task", "src.py", 5L, 12L, "a task", Map.empty[String, String]),
      ("Function", "__init__", "src.py", 6L, 8L, "", Map.empty[String, String]),
      ("Function", "abort", "src.py", 10L, 12L, "", Map.empty[String, String]),
      ("Function", "print", "", 0L, 0L, "", Map.empty[String, String])
    ).toDF("label", "name", "path", "src_start", "src_end", "doc", "props"))

    def id(label: String, name: String): Long =
      GraphQueries.getByName(g.graph, label, name).head().getAs[Long]("id")
    val file = GraphQueries.getFile(g.graph, "", "src.py", ".py").head().getAs[Long]("id")
    g.connectEntities(Seq(
      (file, id("Function", "log"), "DEFINES", Map.empty[String, String]),
      (file, id("Class", "Task"), "DEFINES", Map.empty[String, String]),
      (id("Class", "Task"), id("Function", "__init__"), "DEFINES", Map.empty[String, String]),
      (id("Class", "Task"), id("Function", "abort"), "DEFINES", Map.empty[String, String])
    ).toDF("src", "dst", "type", "props"))
    g.addCalls(Seq(
      (id("Function", "abort"), id("Function", "log"), 11L),
      (id("Function", "__init__"), id("Function", "print"), 7L),
      (id("Function", "log"), id("Function", "print"), 3L)
    ).toDF("src", "dst", "pos"))

    println("== stats ==")
    GraphQueries.stats(g.graph).show(false)
    println("== function_called_by(print) — golden: [__init__, log] ==")
    GraphQueries.functionCalledBy(g.graph, "print").show(false)
    println("== find_paths(abort -> print) ==")
    Paths.findPaths(g.graph, id("Function", "abort"), id("Function", "print")).show(false)
    println("== autocomplete 'ab' ==")
    GraphQueries.autoComplete(g.graph, "ab").show(false)

    println("== persistence round-trip ==")
    store.save("pyfixture", g.graph)
    val loaded = store.load("pyfixture")
    println(s"repos=${store.listRepos()}, loaded nodes=${loaded.nodes.count()}, edges=${loaded.edges.count()}")

    println("== backlog + time-travel replay ==")
    g.enableBacklog()
    g.mutate(GraphOp.AddEntity("Function", "extra", "src.py", 20L, 22L, "", Map.empty))
    g.mutate(GraphOp.DeleteFiles(Seq(GraphOp.FileKey("", "src.py", ".py"))))
    println(s"backlog entries: ${g.getBacklog.length}")
    g.getBacklog.foreach(println)
    val g3 = new CodeGraph(spark, "pyfixture", Some(store))
    g.getBacklog.foreach(g3.rerun)
    println(s"after replay: nodes=${g3.graph.nodes.count()} (expect 2: print + extra)")
    g3.graph.nodes.select("id", "labels", "name").orderBy("id").show(false)
    spark.stop()
  }
}
