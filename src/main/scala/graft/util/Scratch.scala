package graft.util

import java.nio.file.{Files, Path}

/** Per-JVM scratch root for gate-created persisted artifacts (band
  * indexes, PQ/IVF indexes, BPE models). Every call still returns a
  * UNIQUE directory — a fixed hashCode-keyed path races
  * overwrite/append/read across concurrent invocations (the 16-way bench
  * warmup runs index gates in parallel) — but all of them live under ONE
  * root that a JVM shutdown hook deletes recursively, so repeated
  * bench/verify runs stop accumulating unbounded index copies in /tmp. */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  private def deleteRec(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete(): Unit
  }

  /** A fresh unique directory under the session scratch root. */
  def dir(tag: String): String = Files.createTempDirectory(root, tag).toString
}
