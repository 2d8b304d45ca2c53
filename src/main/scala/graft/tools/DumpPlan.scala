package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write each named gate's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` — the round-16 optimization deliverable
  * (plans/r16, before/after pairs). Plans are captured at the
  * bench SF so PushedFilters/ReadSchema and join strategies match what
  * the timed pass runs.
  * Usage: SPARK_GRAFT_ONLY=g10_pagerank,t20_bpe_deep_train \
  *   sbt "runMain graft.tools.DumpPlan plans/r16 before"
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r16")
    val tag = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "set SPARK_GRAFT_ONLY to a comma list of gates")
    val spark = graft.util.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[dumpplan] wrote $outDir/${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
