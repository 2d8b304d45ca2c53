package graft.tools


/** Dev timing harness: run one SparkEntry query cold then warm, with the
  * Catalyst phases split out — separates plan/codegen warmup (per-JVM,
  * amortized in a resident deployment) from steady-state execution.
  * Usage: SPARK_GRAFT_ONLY=d05_simhash_pairs sbt "runMain graft.tools.Scratch"
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = sys.env.getOrElse("SPARK_GRAFT_ONLY", "d05_simhash_pairs")
    val spark = graft.util.Sessions.local(32)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    time("analyze") { df.queryExecution.analyzed }
    time("optimize") { df.queryExecution.optimizedPlan }
    time("plan") { df.queryExecution.executedPlan }
    time("execute cold") { df.count() }
    (1 to 2).foreach { i =>
      time(s"run warm #$i") {
        graft.SparkEntry.queries(name)(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
