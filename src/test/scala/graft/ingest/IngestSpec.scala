package graft.ingest

import graft.SparkSpec
import graft.graph.{CodeGraph, GraphQueries}
import org.apache.spark.sql.functions._

/** End-to-end ingest of the reference's Python fixture (FIXTURES.md §1.1,
  * mirroring /root/reference/tests/source_files/py/src.py and the golden
  * assertions of tests/test_py_analyzer.py:28-59). */
class IngestSpec extends SparkSpec {

  val fixtureSource: String = Seq(
    /* 0 */ "# fixture",
    /* 1 */ "",
    /* 2 */ "def log(msg):",
    /* 3 */ "    print(msg)",
    /* 4 */ "",
    /* 5 */ "class Task:",
    /* 6 */ "    def __init__(self, name, duration):",
    /* 7 */ "        self.name = name",
    /* 8 */ "        print(name)",
    /* 9 */ "",
    /* 10 */ "    def abort(self, delay):",
    /* 11 */ "        log(\"abort\")",
    /* 12 */ "        return self"
  ).mkString("\n")

  def ingestFixture(): CodeGraph = {
    val g = new CodeGraph(spark, "ingest_py")
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("src.py", fixtureSource)))
    g
  }

  test("python frontend extracts the expected entity hierarchy") {
    val fx = PythonFrontend.extract("src.py", fixtureSource)
    val byName = fx.entities.map(e => e.name -> e).toMap
    assert(byName.keySet === Set("log", "Task", "__init__", "abort"))
    assert(byName("log").label === "Function")
    assert(byName("log").srcStart === 2 && byName("log").srcEnd === 3)
    assert(byName("Task").label === "Class" && byName("Task").srcStart === 5)
    assert(byName("__init__").parentIdx === fx.entities.indexWhere(_.name == "Task"))
    assert(byName("abort").parentIdx === fx.entities.indexWhere(_.name == "Task"))
    val calls = fx.refs.filter(_.kind == "call").map(_.name)
    assert(calls.sorted === Seq("log", "print", "print"))
  }

  test("async def declares a Function entity, not a spurious call ref") {
    val src = Seq(
      /* 0 */ "class Worker:",
      /* 1 */ "    async def run(self, q):",
      /* 2 */ "        await log(q)",
      /* 3 */ "",
      /* 4 */ "async def main():",
      /* 5 */ "    pass"
    ).mkString("\n")
    val fx = PythonFrontend.extract("w.py", src)
    val byName = fx.entities.map(e => e.name -> e).toMap
    assert(byName.keySet === Set("Worker", "run", "main"))
    assert(byName("run").label === "Function" && byName("run").srcStart === 1)
    assert(byName("run").parentIdx === fx.entities.indexWhere(_.name == "Worker"))
    assert(byName("main").srcStart === 4)
    // the only call ref is log(q) from run — the signatures contribute none
    assert(fx.refs.filter(_.kind == "call").map(r => (r.name, r.fromIdx)) ===
      Seq(("log", fx.entities.indexWhere(_.name == "run"))))
  }

  test("golden: ingested graph answers function_called_by(print) == {__init__, log}") {
    val g = ingestFixture()
    val callers = GraphQueries.functionCalledBy(g.graph, "print")
      .head().getAs[scala.collection.Seq[String]]("callers")
    assert(callers.toSet === Set("__init__", "log"))
    val callees = GraphQueries.functionCalls(g.graph, "abort")
      .head().getAs[scala.collection.Seq[String]]("callees")
    assert(callees.toSet === Set("log"))
  }

  test("ingested DEFINES hierarchy matches the fixture graph") {
    val g = ingestFixture()
    // file defines log + Task; Task defines __init__ + abort
    val fns = GraphQueries.getFunctionsInFile(g.graph, "", "src.py", ".py")
      .collect().map(_.getAs[String]("name")).toSet
    assert(fns === Set("log")) // direct Function children of the file
    val taskId = GraphQueries.getByName(g.graph, "Class", "Task")
      .head().getAs[Long]("id")
    val children = GraphQueries.getNeighbors(g.graph, Seq(taskId), Some("DEFINES"))
      .collect().map(_.getAs[String]("name")).toSet
    assert(children === Set("__init__", "abort"))
  }

  test("calls carry position and call-site text") {
    import spark.implicits._
    val g = ingestFixture()
    val abortId = GraphQueries.getByName(g.graph, "Function", "abort")
      .head().getAs[Long]("id")
    val edge = g.graph.edges
      .filter($"type" === "CALLS" && $"src" === abortId).collect()
    assert(edge.length === 1)
    assert(edge(0).getAs[Long]("line") === 11)
    assert(edge(0).getAs[String]("text") === "log(\"abort\")")
  }

  test("decorated defs: decorator lines yield no call refs, scopes intact") {
    val src = Seq(
      /* 0 */ "import functools",
      /* 1 */ "",
      /* 2 */ "class Svc:",
      /* 3 */ "    @functools.lru_cache(maxsize=2)",
      /* 4 */ "    def cached(self, k):",
      /* 5 */ "        return fetch(k)",
      /* 6 */ "",
      /* 7 */ "    @property",
      /* 8 */ "    def name(self):",
      /* 9 */ "        return self._n"
    ).mkString("\n")
    val fx = PythonFrontend.extract("svc.py", src)
    val byName = fx.entities.map(e => e.name -> e).toMap
    assert(byName.keySet === Set("Svc", "cached", "name"))
    val svcIdx = fx.entities.indexWhere(_.name == "Svc")
    assert(byName("cached").parentIdx === svcIdx)
    assert(byName("name").parentIdx === svcIdx)
    // the only call ref is fetch(k) from the body — lru_cache is a
    // decorator, not a body statement (tree-sitter parity)
    assert(fx.refs.filter(_.kind == "call").map(r => (r.name, r.nargs)) ===
      Seq(("fetch", 1)))
    // receiver-stripped arity: cached(self, k) is callable with 1 arg
    assert(byName("cached").arity === 1)
  }

  test("Arity.countArgs: nesting, whitespace, unclosed groups") {
    def at(s: String) = Arity.countArgs(s, s.indexOf('('))
    assert(at("f()") === 0)
    assert(at("f( )") === 0)
    assert(at("f(a)") === 1)
    assert(at("f(a, b)") === 2)
    assert(at("f(g(a,b), c)") === 2) // nested call's comma doesn't count
    assert(at("f(a[1,2], {x: 1, y: 2})") === 2) // brackets/braces nest
    assert(at("f(a,") === -1) // unclosed: unknown beats a wrong guess
    assert(Arity.countArgs("no paren", 0) === -1)
  }

  test("golden: same-name functions resolve to the path-nearer definition") {
    import spark.implicits._
    // two `util` definitions; the caller sits in pkg/a — the pkg/a/util.py
    // one must win over other/util.py (longest shared directory prefix),
    // mirroring import locality (the cheap slice of LSP resolution)
    val g = new CodeGraph(spark, "ingest_prox")
    Ingestor.ingest(g, Seq(
      Ingestor.SourceFile("pkg/a/util.py", "def util(x):\n    return x\n"),
      Ingestor.SourceFile("other/util.py", "def util(x):\n    return x\n"),
      Ingestor.SourceFile("pkg/a/main.py",
        "def main():\n    util(1)\n")))
    val mainId = g.graph.nodes
      .filter($"name" === "main" && $"path" === "pkg/a/main.py")
      .head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === mainId)
      .join(g.graph.nodes.select($"id".as("dst"), $"path".as("callee_path")),
        "dst")
      .collect()
    assert(callee.length === 1)
    assert(callee(0).getAs[String]("callee_path") === "pkg/a/util.py")
  }

  test("golden: overloads resolve by call-site arity") {
    import spark.implicits._
    // Java-style overloads in two files, equal path proximity from the
    // caller: the 2-arg call must pick the 2-parameter overload
    val g = new CodeGraph(spark, "ingest_arity")
    Ingestor.ingest(g, Seq(
      Ingestor.SourceFile("app/One.java",
        "class One {\n  int plot(int a) { return a; }\n}\n"),
      Ingestor.SourceFile("app/Two.java",
        "class Two {\n  int plot(int a, int b) { return a + b; }\n}\n"),
      Ingestor.SourceFile("app/Main.java",
        "class Main {\n  void run() {\n    plot(1, 2);\n  }\n}\n")))
    val runId = g.graph.nodes
      .filter($"name" === "run" && $"path" === "app/Main.java")
      .head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === runId)
      .join(g.graph.nodes.select($"id".as("dst"),
        $"path".as("callee_path")), "dst")
      .collect()
    assert(callee.length === 1)
    assert(callee(0).getAs[String]("callee_path") === "app/Two.java")
  }

  test("python frontend parses import bindings (plain, aliased, from, relative)") {
    val src = Seq(
      "import os",
      "import numpy as np",
      "from a.m1 import f",
      "from b.m2 import g as h, k",
      "from .rel import r",
      "from c import *"
    ).mkString("\n")
    val fx = PythonFrontend.extract("x.py", src)
    assert(fx.imports === Seq(
      ImportDecl("os", "os", ""),
      ImportDecl("np", "numpy", ""),
      ImportDecl("f", "a.m1", "f"),
      ImportDecl("h", "b.m2", "g"),
      ImportDecl("k", "b.m2", "k"),
      ImportDecl("r", "rel", "r")))
    // import lines never surface as call refs (incl. the `import (` form)
    assert(fx.refs.isEmpty)
  }

  test("python imports: trailing comments stripped, paren head not a call") {
    val src = Seq(
      "import numpy as np  # for arrays",
      "from a.m1 import f  # noqa",
      "def go():",
      "    from typing import (",
      "        List,",
      "    )",
      "    return f(1)"
    ).mkString("\n")
    val fx = PythonFrontend.extract("x.py", src)
    assert(fx.imports.take(2) === Seq(
      ImportDecl("np", "numpy", ""),
      ImportDecl("f", "a.m1", "f")))
    // the bare `from typing import (` head must NOT fabricate a call to
    // "import" from the enclosing function
    val calls = fx.refs.filter(_.kind == "call").map(_.name)
    assert(calls === Seq("f"))
  }

  test("golden: a rebound alias resolves to the LAST import (shadowing)") {
    import spark.implicits._
    val g = new CodeGraph(spark, "ingest_shadow")
    Ingestor.ingest(g, Seq(
      Ingestor.SourceFile("a/m1.py", "def f(x):\n    return x\n"),
      Ingestor.SourceFile("b/m1.py", "def f(x):\n    return x\n"),
      Ingestor.SourceFile("c/main.py",
        "from a.m1 import f\nfrom b.m1 import f\ndef main():\n    f(1)\n")))
    val mainId = g.graph.nodes
      .filter($"name" === "main" && $"path" === "c/main.py")
      .head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === mainId)
      .join(g.graph.nodes.select($"id".as("dst"), $"path".as("callee_path")),
        "dst").collect()
    assert(callee.length === 1)
    assert(callee(0).getAs[String]("callee_path") === "b/m1.py")
  }

  test("python frontend tracks required-vs-total arity ranges") {
    val src = Seq(
      "def plain(a, b):",
      "    pass",
      "def defaulted(a, b=2, c=3):",
      "    pass",
      "def varargs(a, *rest, **kw):",
      "    pass"
    ).mkString("\n")
    val byName = PythonFrontend.extract("x.py", src)
      .entities.map(e => e.name -> e).toMap
    assert(byName("plain").arity === 2 && byName("plain").minArity === 2)
    assert(byName("defaulted").arity === 3 && byName("defaulted").minArity === 1)
    assert(byName("varargs").arity === 99 && byName("varargs").minArity === 1)
  }

  test("java/c# frontends parse imports and optional-parameter ranges") {
    val jfx = JavaFrontend.extract("A.java", Seq(
      "import java.util.List;",
      "import static org.junit.Assert.assertTrue;",
      "import a.b.*;",
      "class A {",
      "  int sum(int first, int... rest) { return 0; }",
      "}").mkString("\n"))
    assert(jfx.imports === Seq(
      ImportDecl("List", "java.util", "List"),
      ImportDecl("assertTrue", "org.junit.Assert", "assertTrue")))
    val sum = jfx.entities.find(_.name == "sum").get
    assert(sum.arity === 99 && sum.minArity === 1)

    val cfx = CSharpFrontend.extract("B.cs", Seq(
      "using System.Text;",
      "using Alias = My.Ns.Thing;",
      "class B {",
      "  int Go(int a, int b = 5) { return a; }",
      "}").mkString("\n"))
    assert(cfx.imports === Seq(ImportDecl("Alias", "My.Ns", "Thing")))
    val go = cfx.entities.find(_.name == "Go").get
    assert(go.arity === 2 && go.minArity === 1)
  }

  test("golden: an in-scope import beats path proximity") {
    import spark.implicits._
    // b/util.py sits NEXT TO the caller — proximity alone would pick it;
    // the caller's explicit `from a.m1 import f` must override
    val g = new CodeGraph(spark, "ingest_imp")
    Ingestor.ingest(g, Seq(
      Ingestor.SourceFile("a/m1.py", "def f(x):\n    return x\n"),
      Ingestor.SourceFile("b/util.py", "def f(x):\n    return x\n"),
      Ingestor.SourceFile("b/main.py",
        "from a.m1 import f\ndef main():\n    f(1)\n")))
    val mainId = g.graph.nodes
      .filter($"name" === "main" && $"path" === "b/main.py")
      .head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === mainId)
      .join(g.graph.nodes.select($"id".as("dst"), $"path".as("callee_path")),
        "dst").collect()
    assert(callee.length === 1)
    assert(callee(0).getAs[String]("callee_path") === "a/m1.py")
  }

  test("golden: aliased import resolves to the real symbol in its module") {
    import spark.implicits._
    // two same-name functions in different modules; the caller binds g to
    // b/m2's f — a bare name join would never find `f` from a `g()` call
    val g = new CodeGraph(spark, "ingest_alias")
    Ingestor.ingest(g, Seq(
      Ingestor.SourceFile("a/m1.py", "def f(x):\n    return x\n"),
      Ingestor.SourceFile("b/m2.py", "def f(x):\n    return x\n"),
      Ingestor.SourceFile("c/main.py",
        "from b.m2 import f as g\ndef main():\n    g(1)\n")))
    val mainId = g.graph.nodes
      .filter($"name" === "main" && $"path" === "c/main.py")
      .head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === mainId)
      .join(g.graph.nodes.select($"id".as("dst"), $"path".as("callee_path"),
        $"name".as("callee_name")), "dst").collect()
    assert(callee.length === 1)
    assert(callee(0).getAs[String]("callee_name") === "f")
    assert(callee(0).getAs[String]("callee_path") === "b/m2.py")
    // and no stub Function `g` was fabricated
    assert(GraphQueries.getByName(g.graph, "Function", "g").count() === 0)
  }

  test("golden: qualified call resolves through a module alias (python)") {
    import spark.implicits._
    // `import a.m1 as m; m.f(1)` names module a.m1 as the receiver — the
    // same-directory bare f that proximity would pick must lose, and the
    // file-scope binding must NOT treat `m.f` as the bare name f
    val g = new CodeGraph(spark, "ingest_qual_py")
    Ingestor.ingest(g, Seq(
      Ingestor.SourceFile("a/m1.py", "def f(x):\n    return x\n"),
      Ingestor.SourceFile("c/util.py", "def f(x):\n    return x\n"),
      Ingestor.SourceFile("c/main.py",
        "import a.m1 as m\ndef main():\n    m.f(1)\n")))
    val mainId = g.graph.nodes
      .filter($"name" === "main" && $"path" === "c/main.py")
      .head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === mainId)
      .join(g.graph.nodes.select($"id".as("dst"), $"path".as("callee_path")),
        "dst").collect()
    assert(callee.length === 1)
    assert(callee(0).getAs[String]("callee_path") === "a/m1.py")
  }

  test("golden: qualified call resolves through a type import (java)") {
    import spark.implicits._
    // `import util.Helper; Helper.fmt(x)` — the receiver names the
    // imported type, so util/Helper.java's fmt beats the same-package one
    val g = new CodeGraph(spark, "ingest_qual_java")
    Ingestor.ingest(g, Seq(
      Ingestor.SourceFile("util/Helper.java", Seq(
        "public class Helper {",
        "  public static int fmt(int x) { return x; }",
        "}").mkString("\n")),
      Ingestor.SourceFile("app/Other.java", Seq(
        "public class Other {",
        "  public int fmt(int x) { return x; }",
        "}").mkString("\n")),
      Ingestor.SourceFile("app/Main.java", Seq(
        "import util.Helper;",
        "public class Main {",
        "  public int run(int x) {",
        "    return Helper.fmt(x);",
        "  }",
        "}").mkString("\n"))))
    val runId = g.graph.nodes
      .filter($"name" === "run" && $"path" === "app/Main.java")
      .head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === runId)
      .join(g.graph.nodes.select($"id".as("dst"), $"path".as("callee_path")),
        "dst").collect()
    assert(callee.length === 1)
    assert(callee(0).getAs[String]("callee_path") === "util/Helper.java")
  }

  test("python frontend records the dotted receiver on qualified calls") {
    val fx = PythonFrontend.extract("q.py", Seq(
      "def main():",
      "    np.array(3)",
      "    a.b.f(1, 2)",
      "    plain(7)").mkString("\n"))
    val calls = fx.refs.filter(_.kind == "call")
      .map(r => (r.name, r.qualifier, r.nargs))
    assert(calls === Seq(("array", "np", 1), ("f", "a.b", 2),
      ("plain", "", 1)))
  }

  test("golden: self.m() resolves to the caller's OWN class's method") {
    import spark.implicits._
    // class Beta declares run FIRST (wins any declaration-order tie);
    // Alpha.go's self.run must still resolve to Alpha.run
    val g = new CodeGraph(spark, "ingest_selfres")
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("m.py", Seq(
      "class Beta:",
      "    def run(self, x):",
      "        return x",
      "class Alpha:",
      "    def run(self, x):",
      "        return x",
      "    def go(self):",
      "        return self.run(1)").mkString("\n"))))
    val alpha = g.graph.nodes.filter($"name" === "Alpha").head().getAs[Long]("id")
    val goId = g.graph.nodes.filter($"name" === "go").head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === goId)
      .join(g.graph.nodes.select($"id".as("dst")), "dst")
      .select($"dst").head().getLong(0)
    // the resolved run must be DEFINES-child of Alpha, not Beta
    val parentOfCallee = g.graph.edges
      .filter($"type" === "DEFINES" && $"dst" === callee)
      .select($"src").head().getLong(0)
    assert(parentOfCallee === alpha)
  }

  test("golden: java bare call prefers the enclosing class's method") {
    import spark.implicits._
    // Java scoping searches the enclosing class for bare calls; Util.fmt
    // is declared first in the same file and must lose to Main.fmt
    val g = new CodeGraph(spark, "ingest_javamember")
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("app/Main.java", Seq(
      "class Util {",
      "  public int fmt(int x) { return x; }",
      "}",
      "public class Main {",
      "  public int fmt(int x) { return x; }",
      "  public int run(int x) {",
      "    return fmt(x);",
      "  }",
      "}").mkString("\n"))))
    val main = g.graph.nodes.filter($"name" === "Main").head().getAs[Long]("id")
    val runId = g.graph.nodes.filter($"name" === "run").head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === runId)
      .select($"dst").head().getLong(0)
    val parentOfCallee = g.graph.edges
      .filter($"type" === "DEFINES" && $"dst" === callee)
      .select($"src").head().getLong(0)
    assert(parentOfCallee === main)
  }

  test("golden: default args widen the arity range (same-dir def wins)") {
    import spark.implicits._
    // helper(1) fits defaulted [1,2] of the same-directory definition; the
    // old |declared-args| distance let any exact-1-param def anywhere win
    val g = new CodeGraph(spark, "ingest_arange")
    Ingestor.ingest(g, Seq(
      Ingestor.SourceFile("pkg/a/util.py", "def helper(a, b=2):\n    return a\n"),
      Ingestor.SourceFile("z/other.py", "def helper(a):\n    return a\n"),
      Ingestor.SourceFile("pkg/a/main.py", "def main():\n    helper(1)\n")))
    val mainId = g.graph.nodes
      .filter($"name" === "main" && $"path" === "pkg/a/main.py")
      .head().getAs[Long]("id")
    val callee = g.graph.edges.filter($"type" === "CALLS" && $"src" === mainId)
      .join(g.graph.nodes.select($"id".as("dst"), $"path".as("callee_path")),
        "dst").collect()
    assert(callee.length === 1)
    assert(callee(0).getAs[String]("callee_path") === "pkg/a/util.py")
  }

  test("ingest is idempotent (re-running changes nothing)") {
    val g = ingestFixture()
    val n1 = GraphQueries.stats(g.graph).collect().map(_.getLong(1)).toSeq
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("src.py", fixtureSource)))
    val n2 = GraphQueries.stats(g.graph).collect().map(_.getLong(1)).toSeq
    assert(n1 === n2)
  }

  test("jsonl frontend ingests the same shape") {
    val jsonl = Seq(
      """{"kind":"entity","label":"Function","name":"log","start":2,"end":3,"doc":"","parent":-1}""",
      """{"kind":"entity","label":"Class","name":"Task","start":5,"end":12,"doc":"","parent":-1}""",
      """{"kind":"entity","label":"Function","name":"__init__","start":6,"end":8,"doc":"","parent":1}""",
      """{"kind":"entity","label":"Function","name":"abort","start":10,"end":12,"doc":"","parent":1}""",
      """{"kind":"ref","refKind":"call","from":0,"name":"print","line":3,"text":"print(msg)"}""",
      """{"kind":"ref","refKind":"call","from":2,"name":"print","line":8,"text":"print(name)"}""",
      """{"kind":"ref","refKind":"call","from":3,"name":"log","line":11,"text":"log(\"abort\")"}"""
    ).mkString("\n")
    val g = new CodeGraph(spark, "ingest_jsonl")
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("src.py.jsonl", jsonl)))
    val callers = GraphQueries.functionCalledBy(g.graph, "print")
      .head().getAs[scala.collection.Seq[String]]("callers")
    assert(callers.toSet === Set("__init__", "log"))
  }

  test("dependency expansion lists declared packages' site-packages sources") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("dep_exp")
    Files.writeString(root.resolve("requirements.txt"),
      "alpha==1.0\n# comment\nbeta>=2.1\n\ngamma\n")
    val sp = root.resolve("venv/lib/python3.11/site-packages")
    Files.createDirectories(sp.resolve("alpha/sub"))
    Files.createDirectories(sp.resolve("beta"))
    Files.writeString(sp.resolve("alpha/a.py"), "def fa():\n    pass\n")
    Files.writeString(sp.resolve("alpha/sub/nested.py"), "x = 1\n") // not direct child
    Files.writeString(sp.resolve("alpha/data.txt"), "not python")
    Files.writeString(sp.resolve("beta/b.py"), "def fb():\n    pass\n")
    assert(DependencyExpansion.declaredDependencies(root) ===
      Seq("alpha", "beta", "gamma"))
    val found = DependencyExpansion.expand(root).map(root.relativize(_).toString)
    assert(found === Seq(
      "venv/lib/python3.11/site-packages/alpha/a.py",
      "venv/lib/python3.11/site-packages/beta/b.py"))
    // expanded sources flow through the normal ingest path
    val g = new CodeGraph(spark, "ingest_deps")
    Ingestor.ingest(g, DependencyExpansion.sourceFiles(root))
    assert(GraphQueries.getByName(g.graph, "Function", "fa").count() === 1)
    assert(GraphQueries.getByName(g.graph, "Function", "fb").count() === 1)
  }

  test("expandAll dedupes against sources the repo walk already read") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("dep_all")
    Files.writeString(root.resolve("requirements.txt"), "alpha\n")
    val sp = root.resolve("venv/lib/python3.11/site-packages")
    Files.createDirectories(sp.resolve("alpha"))
    Files.writeString(sp.resolve("alpha/a.py"), "def fa():\n    pass\n")
    val already = Seq(Ingestor.SourceFile(
      "venv/lib/python3.11/site-packages/alpha/a.py", "def fa():\n    pass\n"))
    // a non-ignored venv walk picked the file up: expansion adds nothing
    assert(DependencyExpansion.expandAll(root, already) === Seq.empty)
    // an ignored venv walk did not: expansion restores the declared dep
    assert(DependencyExpansion.expandAll(root, Seq.empty).map(_.path) ===
      Seq("venv/lib/python3.11/site-packages/alpha/a.py"))
  }

  test("maven dependency expansion reads .java entries from sources jars") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("dep_mvn")
    Files.writeString(root.resolve("pom.xml"), Seq(
      "<project>", "<dependencies>",
      "  <dependency>",
      "    <groupId>com.example</groupId>",
      "    <artifactId>lib</artifactId>",
      "    <version>1.2</version>",
      "  </dependency>",
      "</dependencies>", "</project>").mkString("\n"))
    assert(DependencyExpansion.declaredMavenDependencies(root) ===
      Seq(("com.example", "lib", "1.2")))
    val m2 = Files.createTempDirectory("m2")
    val jarDir = m2.resolve("com/example/lib/1.2")
    Files.createDirectories(jarDir)
    val jos = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(jarDir.resolve("lib-1.2-sources.jar")))
    jos.putNextEntry(new java.util.zip.ZipEntry("com/example/A.java"))
    jos.write("class A { void m() {} }".getBytes("UTF-8"))
    jos.closeEntry()
    jos.putNextEntry(new java.util.zip.ZipEntry("META-INF/MANIFEST.MF"))
    jos.write("Manifest-Version: 1.0\n".getBytes("UTF-8"))
    jos.closeEntry()
    jos.close()
    val srcs = DependencyExpansion.mavenSourceFiles(root, Some(m2))
    assert(srcs.map(_.path) === Seq("lib-1.2/com/example/A.java"))
    assert(srcs.head.source.contains("class A"))
  }

  test("dotnet restore leg: guards short-circuit; restore runs when possible") {
    import java.nio.file.Files
    // no project file → no restore attempted, regardless of toolchain
    val empty = Files.createTempDirectory("dep_cs_none")
    assert(!DependencyExpansion.dotnetRestore(empty))
    // temp_deps_cs marker short-circuits (reference analyzer.py:27-28)
    val marked = Files.createTempDirectory("dep_cs_marked")
    Files.writeString(marked.resolve("app.csproj"), "<Project Sdk=\"Microsoft.NET.Sdk\"/>")
    Files.createDirectories(marked.resolve("temp_deps_cs"))
    assert(!DependencyExpansion.dotnetRestore(marked))
    // real restore needs the dotnet CLI — cancel on machines without it
    // (the ReferenceFixtureSpec cancel-if-missing pattern)
    val root = Files.createTempDirectory("dep_cs")
    Files.writeString(root.resolve("app.csproj"), Seq(
      "<Project Sdk=\"Microsoft.NET.Sdk\">",
      "  <PropertyGroup><TargetFramework>net8.0</TargetFramework></PropertyGroup>",
      "</Project>").mkString("\n"))
    if (!DependencyExpansion.dotnetAvailable)
      cancel("dotnet CLI not installed on this machine")
    assert(DependencyExpansion.dotnetRestore(root))
  }

  test("poetry manifests win over requirements.txt") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("dep_poetry")
    Files.writeString(root.resolve("requirements.txt"), "ignored==1.0\n")
    Files.writeString(root.resolve("pyproject.toml"), Seq(
      "[tool.poetry]", "name = \"x\"", "",
      "[tool.poetry.dependencies]", "python = \"^3.11\"",
      "delta = \"1.2.3\"", "",
      "[tool.poetry.group.dev.dependencies]", "pytest = \"*\"").mkString("\n"))
    assert(DependencyExpansion.declaredDependencies(root) ===
      Seq("python", "delta"))
  }

  test("base classes resolve to EXTENDS edges") {
    import spark.implicits._
    val src = Seq(
      "class Base:",
      "    pass",
      "",
      "class Child(Base):",
      "    pass").mkString("\n")
    val g = new CodeGraph(spark, "ingest_ext")
    Ingestor.ingest(g, Seq(Ingestor.SourceFile("m.py", src)))
    val base = GraphQueries.getByName(g.graph, "Class", "Base").head().getAs[Long]("id")
    val child = GraphQueries.getByName(g.graph, "Class", "Child").head().getAs[Long]("id")
    val e = g.graph.edges.filter($"type" === "EXTENDS").collect()
    assert(e.length === 1)
    assert(e(0).getAs[Long]("src") === child && e(0).getAs[Long]("dst") === base)
  }
}
