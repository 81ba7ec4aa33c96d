package graft

import java.nio.file.{Files, Path}

/** Per-JVM scratch root for queries that materialize intermediate
  * state (lake lifecycles, streaming watch dirs, shard exports). All
  * scratch dirs live under ONE root that a shutdown hook deletes, so
  * repeated invocations — the bench runs every query three times —
  * don't accumulate full copies of exported/laked data on disk.
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the session scratch root. */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) deleteRecursively(it.next())
      } finally s.close()
    }
    try Files.deleteIfExists(p)
    catch { case _: java.io.IOException => () } // best-effort GC
  }
}
