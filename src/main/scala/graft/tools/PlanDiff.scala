package graft.tools

/** Dev tool: print the per-stage join/exchange strategy mix a query's
  * FINAL executed plan used at two SFs — a quick answer to "does the
  * warmup SF compile the same shapes the target SF runs?".
  * Usage: SPARK_GRAFT_ONLY=g10_pagerank sbt "runMain graft.tools.PlanDiff"
  */
object PlanDiff {
  def main(args: Array[String]): Unit = {
    val name = sys.env.getOrElse("SPARK_GRAFT_ONLY", "g10_pagerank")
    val dirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.util.Sessions.local(32)
    val keys = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "BroadcastExchange", "AQEShuffleRead",
      "Exchange", "HashAggregate", "ObjectHashAggregate", "SortAggregate")
    dirs.foreach { d =>
      val df = graft.SparkEntry.queries(name)(spark, d)
      df.count() // let AQE finalize
      val p = df.queryExecution.executedPlan.toString
      val mix = keys.map(k => s"$k=${k.r.findAllIn(p).length}")
        .filter(!_.endsWith("=0")).mkString(" ")
      println(s"[plandiff] $name @ $d: $mix")
    }
    spark.stop()
  }
}
