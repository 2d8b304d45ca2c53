package graft.util

import java.nio.file.{Files, Paths}

/** Spark local-dir selection shared by every entrypoint: tmpfs when the
  * host has one (the bench VM's virtio disk gets burst-throttled — minutes
  * of stall mid-run), the JVM temp dir otherwise (portability: /dev/shm is
  * Linux-only). */
object LocalTmp {
  def sparkLocalDir(suffix: String): String = {
    val base =
      if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val dir = s"$base/$suffix"
    new java.io.File(dir).mkdirs()
    dir
  }
}
