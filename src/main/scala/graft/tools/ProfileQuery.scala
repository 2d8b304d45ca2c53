package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import scala.collection.mutable.ArrayBuffer

/** Dev profiler: run one SparkEntry query with a stage listener and print
  * the most expensive stages (duration, tasks, shuffle bytes, callsite).
  * Usage: SPARK_GRAFT_ONLY=g08_graph_delete_cascade sbt "runMain graft.tools.ProfileQuery"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = sys.env.getOrElse("SPARK_GRAFT_ONLY", "g08_graph_delete_cascade")
    val spark = graft.util.Sessions.local(cpus.toInt)

    final case class St(id: Int, name: String, ms: Long, tasks: Int,
        shufRead: Long, shufWrite: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b
        stages.synchronized {
          stages += St(si.stageId, si.name, ms.getOrElse(-1L), si.numTasks,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    // reps > 1: profile the LAST (steady-state) run, JIT/codegen warm
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    (1 until reps).foreach { _ =>
      graft.SparkEntry.queries(name)(spark, sfDir).count()
    }
    stages.synchronized(stages.clear())
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"== $name rows=$n wall=$wall%.1fs stages=${stages.size} sumStageMs=${stages.map(_.ms).sum}")
    stages.sortBy(-_.ms).take(40).foreach { s =>
      println(f"${s.ms}%7d ms  ${s.tasks}%5d tasks  r=${s.shufRead / 1024 / 1024}%5dMB w=${s.shufWrite / 1024 / 1024}%5dMB  [${s.id}] ${s.name.linesIterator.next()}")
    }
    spark.stop()
  }
}
