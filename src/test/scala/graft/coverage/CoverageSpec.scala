package graft.coverage

import graft.SparkSpec
import graft.graph.{CodeGraph, GraphOp, GraphQueries}
import org.apache.spark.sql.functions._

/** F1–F3 (`/root/reference/api/code_coverage/lcov/lcov.py`). */
class CoverageSpec extends SparkSpec {

  private val fixture =
    """TN:unit
      |SF:/__w/proj/proj/src/util.py
      |FN:3,helper
      |FN:10,main
      |FNDA:7,helper
      |FNDA:-,main
      |DA:3,1
      |DA:4,0
      |DA:10,5
      |DA:12,null
      |LF:3
      |LH:2
      |BRDA:10,1,0,1
      |BRDA:10,1,1,-
      |end_of_record
      |TN:unit
      |SF:/__w/proj/proj/src/empty.py
      |LF:1
      |LH:1
      |DA:1,1
      |end_of_record
      |""".stripMargin

  test("lcov parser: TN/SF/DA/FN/FNDA/LF/LH/BRDA golden record") {
    val records = Lcov.parse(fixture)
    assert(records.length == 2)
    val r = records.head
    assert(r.test == "unit")
    assert(r.file == "/__w/proj/proj/src/util.py")
    assert(r.linesFound == 3 && r.linesHit == 2)
    // DA with 'null' content is skipped (lcov.py:74-78)
    assert(r.daLines == Seq((3L, 1L), (4L, 0L), (10L, 5L)))
    // FNDA '-' leaves the function hit at 0 (lcov.py:95-102)
    assert(r.functions == Seq((3L, "helper", 7L), (10L, "main", 0L)))
    assert(r.branches == Seq((10L, 1L, 0L, 1L), (10L, 1L, 1L, 0L)))
    assertThrows[IllegalArgumentException](Lcov.parse("TN:x\nSF:y\n"))
  }

  test("parseTracefiles: distributed parse splits the graph file key") {
    import spark.implicits._
    val df = Seq(("ci.lcov", fixture)).toDF("source", "content")
    val rows = Lcov.parseTracefiles(df, stripPrefix = "/__w/proj/proj/")
      .orderBy($"name").collect()
    assert(rows.length == 2)
    val util = rows.find(_.getAs[String]("name") == "util.py").get
    assert(util.getAs[String]("path") == "src")
    assert(util.getAs[String]("ext") == ".py")
    assert(math.abs(util.getAs[Double]("pct") - 2.0 / 3) < 1e-9)
  }

  /** Direct port of the reference's consume-the-lines loop
    * (`lcov.py:174-208`) as the test oracle. */
  private def referenceLoop(funcs: Seq[(Long, Long, Long)],
      daLines: Seq[Long]): Map[Long, Double] = {
    var lines = daLines.sorted.toList
    val out = Map.newBuilder[Long, Double]
    for ((fid, start, end) <- funcs.sortBy(f => (f._2, f._1))) {
      var idx = 0
      while (idx < lines.length && start > lines(idx)) idx += 1
      var cov = 0.0
      if (idx == lines.length) { cov = 0.0; lines = Nil; idx = 0 }
      val n = lines.length
      var hits = 0
      while (idx < n && start <= lines(idx) && end >= lines(idx)) {
        idx += 1; hits += 1
      }
      cov = hits.toDouble / math.max(1L, end - start)
      out += fid -> cov
      lines = lines.drop(idx)
    }
    out.result()
  }

  test("functionCoverage matches the sequential loop, incl. overlaps") {
    import spark.implicits._
    // nested/overlapping intervals: f2 inside f1, f3 after, f4 disjoint file
    val funcs = Seq((1L, 10L, 40L), (2L, 15L, 25L), (3L, 42L, 60L), (4L, 5L, 9L))
    val da = Seq(11L, 16L, 20L, 39L, 45L, 45L, 59L, 61L, 7L)
    val fnsDf = funcs.map { case (id, s, e) => ("fileA", id, s, e) }
      .toDF("file", "fid", "src_start", "src_end")
    val daDf = da.map(l => ("fileA", l)).toDF("file", "line")
    val got = Lcov.functionCoverage(fnsDf, daDf).collect()
      .map(r => r.getAs[Long]("fid") -> r.getAs[Double]("coverage")).toMap
    val want = referenceLoop(funcs.map(f => (f._1, f._2, f._3)), da)
    assert(got.keySet == want.keySet)
    got.foreach { case (fid, cov) =>
      assert(math.abs(cov - want(fid)) < 1e-9, s"fid=$fid got=$cov want=${want(fid)}")
    }
  }

  test("applyLcov: full file cascades 1.0; partial file sets function pcts") {
    import spark.implicits._
    val g = new CodeGraph(spark, "covtest")
    g.addFiles(Seq(("src", "util.py", ".py"), ("src", "empty.py", ".py"))
      .toDF("path", "name", "ext"))
    g.addEntities(Seq(
        ("Function", "helper", "src/util.py", 3L, 8L, "", Map.empty[String, String]),
        ("Function", "main", "src/util.py", 10L, 20L, "", Map.empty[String, String]))
      .toDF("label", "name", "path", "src_start", "src_end", "doc", "props"))
    // DEFINES so the 1.0 cascade can reach functions (M6 semantics)
    val ids = g.graph.nodes.select($"id", $"name").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("id")).toMap
    g.connectEntities(Seq(
        (ids("util.py"), ids("helper"), "DEFINES", Map.empty[String, String]),
        (ids("util.py"), ids("main"), "DEFINES", Map.empty[String, String]))
      .toDF("src", "dst", "type", "props"))

    Lcov.applyLcov(g, fixture, stripPrefix = "/__w/proj/proj/")

    val cov = g.graph.nodes
      .select($"name", $"coverage_precentage").collect()
      .map(r => r.getAs[String]("name") ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    // util.py: 2/3 covered
    assert(math.abs(cov("util.py").get - 2.0 / 3) < 1e-9)
    // helper [3,8]: DA lines {3,4} in range → 2 / (8-3)
    assert(math.abs(cov("helper").get - 2.0 / 5) < 1e-9)
    // main [10,20]: remaining DA {10} → 1 / 10
    assert(math.abs(cov("main").get - 1.0 / 10) < 1e-9)
    // empty.py fully covered → 1.0 (M6, no functions to cascade to)
    assert(cov("empty.py").contains(1.0))
  }

  test("applyLcov issues O(1) mutations for a multi-record tracefile") {
    import spark.implicits._
    // 6 files, mixed full/partial — per-record mutations would log ≥6 ops
    val many = (1 to 6).map { i =>
      val hit = if (i % 2 == 0) 4 else 2
      s"""TN:unit
         |SF:src/f$i.py
         |DA:1,1
         |DA:2,1
         |LF:4
         |LH:$hit
         |end_of_record""".stripMargin
    }.mkString("\n")
    val g = new CodeGraph(spark, "covbatch")
    g.addFiles((1 to 6).map(i => ("src", s"f$i.py", ".py"))
      .toDF("path", "name", "ext"))
    // functions inside two partial files so the M5 leg fires too
    g.addEntities(Seq(
        ("Function", "a", "src/f1.py", 1L, 2L, "", Map.empty[String, String]),
        ("Function", "b", "src/f3.py", 1L, 2L, "", Map.empty[String, String]))
      .toDF("label", "name", "path", "src_start", "src_end", "doc", "props"))
    val ids = g.graph.nodes.select($"id", $"name").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("id")).toMap
    g.connectEntities(Seq(
        (ids("f1.py"), ids("a"), "DEFINES", Map.empty[String, String]),
        (ids("f3.py"), ids("b"), "DEFINES", Map.empty[String, String]))
      .toDF("src", "dst", "type", "props"))
    g.enableBacklog()
    Lcov.applyLcov(g, many)
    // one M6 batch + one M5 batch, regardless of record count
    assert(g.getBacklog.length == 2,
      s"expected 2 batched mutations, got ${g.getBacklog.length}")
    val cov = g.graph.nodes.filter(array_contains($"labels", "File"))
      .select($"name", $"coverage_precentage").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Double](1)).toMap
    assert(cov("f1.py") == 0.5 && cov("f2.py") == 1.0)
    // the function batch landed: a [1,2] sees DA {1,2} → 2/(2-1) capped by
    // the reference formula = 2.0/1 — faithful to lcov.py:205
    val fcov = g.graph.nodes.filter($"name" === "a")
      .select($"coverage_precentage").head().getDouble(0)
    assert(fcov == 2.0)

    // the batched op round-trips through the op-log (M11 replay surface)
    val op = GraphOp.SetFilesCoverage(Seq(
      GraphOp.FileCoverageRow("src", "x.py", ".py", 0.25)))
    assert(graft.graph.OpLog.decode(graft.graph.OpLog.encode(op)) == op)
  }

  test("coverageDelta classifies gained/lost/still/added/removed per line") {
    import spark.implicits._
    def tf(src: String, das: Seq[(Long, Long)]): (String, String) =
      (src, (Seq("TN:t", s"SF:$src.py") ++
        das.map { case (l, h) => s"DA:$l,$h" } ++
        Seq(s"LF:${das.length}",
          s"LH:${das.count(_._2 > 0)}", "end_of_record")).mkString("\n"))
    // run A: lines 1(hit) 2(miss) 3(hit) 4(hit); run B: 1 miss (lost),
    // 2 hit (gained), 3 hit (still), 4 absent (removed), 5 new (added)
    val a = Lcov.parseTracefiles(Seq(
      tf("u", Seq(1L -> 1L, 2L -> 0L, 3L -> 2L, 4L -> 1L)))
      .toDF("source", "content"))
    val b = Lcov.parseTracefiles(Seq(
      tf("u", Seq(1L -> 0L, 2L -> 3L, 3L -> 1L, 5L -> 1L)))
      .toDF("source", "content"))
    val r = Lcov.coverageDelta(a, b).head()
    assert(r.getAs[String]("name") === "u.py")
    assert(r.getAs[Long]("n_gained") === 1)
    assert(r.getAs[Long]("n_lost") === 1)
    assert(r.getAs[Long]("n_still_hit") === 1)
    assert(r.getAs[Long]("n_added") === 1)
    assert(r.getAs[Long]("n_removed") === 1)
  }
}
