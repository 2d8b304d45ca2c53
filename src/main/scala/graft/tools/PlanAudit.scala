package graft.tools


/** Dev audit: for every SparkEntry query, print the physical join/exchange
  * operators in its compiled plan — the quick way to spot a cartesian or
  * an unexpected shuffle after a refactor.
  * Usage: sbt "runMain graft.tools.PlanAudit" [sfDir]
  */
object PlanAudit {
  private val Interesting =
    Seq("CartesianProduct", "BroadcastNestedLoopJoin", "BroadcastHashJoin",
      "SortMergeJoin", "ShuffledHashJoin", "Exchange", "TakeOrdered")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.util.Sessions.local(8)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val found = Interesting.filter(plan.contains).mkString(", ")
        println(s"[audit] $name: $found")
      } catch {
        case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
