package graft.ingest

import graft.SparkSpec
import graft.graph.CodeGraph
import org.apache.spark.sql.functions._

/** Java + C# frontends over the reference's C# fixture program
  * (mirroring `/root/reference/tests/source_files/csharp/Program.cs` and
  * the golden assertions of `tests/test_csharp_analyzer.py:30-69`), plus a
  * Java equivalent exercising extends/implements
  * (`api/analyzers/java/analyzer.py:70-95`). */
class CFamilySpec extends SparkSpec {

  test("one-line body that also closes the class does not swallow the file") {
    // `{ return g(x); }}` — the method's body opens AND closes on its
    // declaration line, which ALSO closes the class (netBraces = -1).
    // The entity must complete there with its body call collected, and
    // class B afterwards must parse as a fresh top-level type.
    val src = Seq(
      "class A {",
      "  int f(int x) { return g(x); }}",
      "class B {",
      "  int h(int x) { return x; }",
      "}").mkString("\n")
    val fx = JavaFrontend.extract("A.java", src)
    assert(fx.entities.map(e => (e.label, e.name, e.parentIdx)) === Seq(
      ("Class", "A", -1), ("Method", "f", 0),
      ("Class", "B", -1), ("Method", "h", 2)))
    assert(fx.refs.exists(r =>
      r.kind == "call" && r.name == "g" && r.fromIdx == 1))
  }

  val csharpSource: String = Seq(
    /*  0 */ "using System;",
    /*  1 */ "",
    /*  2 */ "namespace TestProject",
    /*  3 */ "{",
    /*  4 */ "    public interface ILogger",
    /*  5 */ "    {",
    /*  6 */ "        void Log(string message);",
    /*  7 */ "    }",
    /*  8 */ "",
    /*  9 */ "    public class ConsoleLogger : ILogger",
    /* 10 */ "    {",
    /* 11 */ "        public void Log(string message)",
    /* 12 */ "        {",
    /* 13 */ "            Console.WriteLine(message);",
    /* 14 */ "        }",
    /* 15 */ "    }",
    /* 16 */ "",
    /* 17 */ "    /// <summary>Represents a task.</summary>",
    /* 18 */ "    public class Task",
    /* 19 */ "    {",
    /* 20 */ "        public string Name { get; set; }",
    /* 21 */ "",
    /* 22 */ "        private ILogger _logger;",
    /* 23 */ "",
    /* 24 */ "        public Task(string name, int duration, ILogger logger)",
    /* 25 */ "        {",
    /* 26 */ "            Name = name;",
    /* 27 */ "            _logger = logger;",
    /* 28 */ "            _logger.Log(\"Task created: \" + name);",
    /* 29 */ "        }",
    /* 30 */ "",
    /* 31 */ "        public bool Execute()",
    /* 32 */ "        {",
    /* 33 */ "            _logger.Log(\"Executing: \" + Name);",
    /* 34 */ "            return true;",
    /* 35 */ "        }",
    /* 36 */ "",
    /* 37 */ "        public void Abort(float delay)",
    /* 38 */ "        {",
    /* 39 */ "            _logger.Log(\"Aborting: \" + Name);",
    /* 40 */ "            Execute();",
    /* 41 */ "        }",
    /* 42 */ "    }",
    /* 43 */ "",
    /* 44 */ "    public struct Point : IShape",
    /* 45 */ "    {",
    /* 46 */ "        public int X;",
    /* 47 */ "        public int Y;",
    /* 48 */ "    }",
    /* 49 */ "",
    /* 50 */ "    public interface IShape",
    /* 51 */ "    {",
    /* 52 */ "        int Area();",
    /* 53 */ "    }",
    /* 54 */ "}"
  ).mkString("\n")

  val javaSource: String = Seq(
    /*  0 */ "package test;",
    /*  1 */ "",
    /*  2 */ "public interface Logger extends AutoCloseable {",
    /*  3 */ "    void log(String message);",
    /*  4 */ "}",
    /*  5 */ "",
    /*  6 */ "class BaseTask {",
    /*  7 */ "    protected int duration;",
    /*  8 */ "}",
    /*  9 */ "",
    /* 10 */ "public class Task extends BaseTask implements Logger, Runnable {",
    /* 11 */ "    private String name;",
    /* 12 */ "",
    /* 13 */ "    public Task(String name) {",
    /* 14 */ "        this.name = name;",
    /* 15 */ "    }",
    /* 16 */ "",
    /* 17 */ "    @Override",
    /* 18 */ "    public void log(String message) {",
    /* 19 */ "        System.out.println(message);",
    /* 20 */ "    }",
    /* 21 */ "",
    /* 22 */ "    public void run() {",
    /* 23 */ "        log(\"running \" + name);",
    /* 24 */ "    }",
    /* 25 */ "",
    /* 26 */ "    public enum Status { READY, DONE }",
    /* 27 */ "}"
  ).mkString("\n")

  test("csharp frontend: labels, scopes, heritage, calls") {
    val fx = CSharpFrontend.extract("Program.cs", csharpSource)
    def one(name: String, label: String) =
      fx.entities.find(e => e.name == name && e.label == label).get
    assert(one("ILogger", "Interface").label == "Interface")
    assert(one("ConsoleLogger", "Class").label == "Class")
    assert(one("Task", "Class").label == "Class")
    // Log appears twice (interface member + ConsoleLogger method)
    assert(fx.entities.count(_.name == "Log") == 2)
    assert(fx.entities.exists(e => e.name == "Execute" && e.label == "Method"))
    assert(fx.entities.exists(e => e.name == "Abort" && e.label == "Method"))
    assert(fx.entities.exists(e => e.name == "Task" && e.label == "Constructor"))
    // scopes: ConsoleLogger [9,15]; Task class [18,42]
    assert(one("ConsoleLogger", "Class").srcStart == 9 &&
      one("ConsoleLogger", "Class").srcEnd == 15)
    assert(one("Task", "Class").srcStart == 18 &&
      one("Task", "Class").srcEnd == 42)
    // methods parented under their classes
    val taskIdx = fx.entities.indexWhere(e => e.name == "Task" && e.label == "Class")
    assert(fx.entities.filter(e => Set("Execute", "Abort").contains(e.name))
      .forall(_.parentIdx == taskIdx))
    // heritage: first base of a class is tagged base_class (csharp/analyzer.py:80-88)
    assert(fx.refs.exists(r => r.kind == "base_class" && r.name == "ILogger"))
    // struct surface (S6): label + base list all implement_interface
    assert(one("Point", "Struct").label == "Struct")
    val pointIdx = fx.entities.indexWhere(e => e.name == "Point" && e.label == "Struct")
    assert(fx.refs.exists(r => r.kind == "implement_interface" &&
      r.name == "IShape" && r.fromIdx == pointIdx))
    // calls: ctor logs, Execute logs, Abort logs + calls Execute
    val calls = fx.refs.filter(_.kind == "call").map(_.name)
    assert(calls.count(_ == "Log") == 3)
    assert(calls.contains("Execute"))
    assert(calls.contains("WriteLine"))
    // parameter types captured
    assert(fx.refs.exists(r => r.kind == "parameters" && r.name == "ILogger"))
    assert(fx.refs.exists(r => r.kind == "parameters" && r.name == "float"))
  }

  test("golden: C# ingest yields IMPLEMENTS via interface-label correction") {
    import spark.implicits._
    val g = new CodeGraph(spark, "ingest_cs")
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("Program.cs", csharpSource)))
    val nodes = g.graph.nodes.select($"id", $"name", element_at($"labels", 1).as("label"))
    val ids = nodes.collect().map(r => (r.getAs[String]("name"), r.getAs[String]("label")) -> r.getAs[Long]("id")).toMap
    // tests/test_csharp_analyzer.py:30-55 surface
    assert(ids.contains(("ILogger", "Interface")))
    assert(ids.contains(("ConsoleLogger", "Class")))
    assert(ids.contains(("Task", "Class")))
    assert(ids.contains(("Task", "Constructor")))
    assert(ids.keys.exists(_._1 == "Execute"))
    assert(ids.keys.exists(_._1 == "Abort"))
    // ConsoleLogger -[:IMPLEMENTS]-> ILogger (test_csharp_analyzer.py:66-69):
    // syntactic base_class corrected because the target is an Interface
    val impl = g.graph.edges.filter($"type" === "IMPLEMENTS" &&
      $"src" === ids(("ConsoleLogger", "Class")) &&
      $"dst" === ids(("ILogger", "Interface")))
    assert(impl.count() == 1)
    // Task class DEFINES its methods
    val taskDefines = g.graph.edges.filter($"type" === "DEFINES" &&
      $"src" === ids(("Task", "Class")))
    assert(taskDefines.count() >= 3) // ctor + Execute + Abort
    // CALLS: Abort -> Execute
    val abortId = ids.collectFirst { case ((n, "Method"), id) if n == "Abort" => id }.get
    val execId = ids.collectFirst { case ((n, "Method"), id) if n == "Execute" => id }.get
    assert(g.graph.edges.filter($"type" === "CALLS" &&
      $"src" === abortId && $"dst" === execId).count() == 1)
    // S6 get_struct: point lookup by (Struct, name)
    val struct = graft.graph.GraphQueries.getByName(g.graph, "Struct", "Point")
    assert(struct.count() == 1)
    // struct base resolves to Interface -> IMPLEMENTS
    assert(g.graph.edges.filter($"type" === "IMPLEMENTS" &&
      $"src" === ids(("Point", "Struct")) &&
      $"dst" === ids(("IShape", "Interface"))).count() == 1)
    // T2/T3 CONTAINS + size()/length() surface
    val hits = graft.graph.GraphQueries.searchContains(g.graph, "xecut").collect()
    assert(hits.length == 1)
    assert(hits(0).getAs[String]("name") == "Execute")
    assert(hits(0).getAs[Int]("name_len") == 7)
    assert(hits(0).getAs[Int]("n_labels") == 2) // Method + Searchable
  }

  test("java frontend: extends/implements/interface-extends surface") {
    val fx = JavaFrontend.extract("Task.java", javaSource)
    val byName = fx.entities.map(e => (e.name, e.label)).toSet
    assert(byName.contains(("Logger", "Interface")))
    assert(byName.contains(("BaseTask", "Class")))
    assert(byName.contains(("Task", "Class")))
    assert(byName.contains(("Task", "Constructor")))
    assert(byName.contains(("log", "Method")))
    assert(byName.contains(("run", "Method")))
    assert(byName.contains(("Status", "Enum")))
    // heritage kinds (java/analyzer.py:70-95)
    assert(fx.refs.exists(r => r.kind == "extend_interface" && r.name == "AutoCloseable"))
    assert(fx.refs.exists(r => r.kind == "base_class" && r.name == "BaseTask"))
    assert(fx.refs.exists(r => r.kind == "implement_interface" && r.name == "Logger"))
    assert(fx.refs.exists(r => r.kind == "implement_interface" && r.name == "Runnable"))
    // enum nested under Task
    val taskIdx = fx.entities.indexWhere(e => e.name == "Task" && e.label == "Class")
    assert(fx.entities.find(_.name == "Status").get.parentIdx == taskIdx)
    val calls = fx.refs.filter(_.kind == "call").map(_.name)
    assert(calls.contains("println") && calls.contains("log"))
  }

  test("java frontend: nested generics and annotations in signatures") {
    val src = Seq(
      "class Cache {",
      "  @Override",
      "  @SuppressWarnings(\"unchecked\")",
      "  public Map<String, List<Integer>> index(Map<String, Set<Long>> in, int n) {",
      "    return build(in, n);",
      "  }",
      "  private Map<String, List<Integer>> build(Map<String, Set<Long>> in, int n) {",
      "    return null;",
      "  }",
      "}").mkString("\n")
    val fx = JavaFrontend.extract("Cache.java", src)
    val byName = fx.entities.map(e => e.name -> e).toMap
    // nested generic return types must not swallow the method name
    assert(byName.contains("index") && byName("index").label == "Method")
    assert(byName.contains("build") && byName("build").label == "Method")
    // arity sees top-level params only (generic commas don't count)
    assert(byName("index").arity === 2)
    assert(byName("build").arity === 2)
    // return_type resolves to the outermost simple name
    assert(fx.refs.exists(r => r.kind == "return_type" && r.name == "Map"))
    val call = fx.refs.find(r => r.kind == "call" && r.name == "build")
    assert(call.exists(_.nargs == 2))
  }

  test("golden: Java ingest wires EXTENDS and IMPLEMENTS edges") {
    import spark.implicits._
    val g = new CodeGraph(spark, "ingest_java")
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("Task.java", javaSource)))
    val ids = g.graph.nodes.select($"id", $"name", element_at($"labels", 1).as("label"))
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("label")) -> r.getAs[Long]("id")).toMap
    val task = ids(("Task", "Class"))
    val base = ids(("BaseTask", "Class"))
    val logger = ids(("Logger", "Interface"))
    assert(g.graph.edges.filter($"type" === "EXTENDS" &&
      $"src" === task && $"dst" === base).count() == 1)
    assert(g.graph.edges.filter($"type" === "IMPLEMENTS" &&
      $"src" === task && $"dst" === logger).count() == 1)
  }
}
