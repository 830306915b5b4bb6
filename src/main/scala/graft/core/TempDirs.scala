package graft.core

import java.nio.file.{Files, Path}

/** JVM-lifetime scratch directories with RECURSIVE cleanup.
  *
  * `File.deleteOnExit` on a directory silently no-ops once anything is
  * written inside it — every staging tree (CSV/JSONL/ORC/partitioned
  * round-trips, streaming file-source stages) survived the JVM and
  * accumulated across runs. One shutdown hook deletes registered trees
  * bottom-up instead.
  */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(
      () => registered.forEach(deleteRecursively(_)),
      "graft-tempdir-cleanup"))

  /** Create a temp directory removed (with contents) at JVM exit. */
  def scratch(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  private[core] def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try {
          walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { Files.deleteIfExists(f); () })
        } finally walk.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () } // exit-path: best effort
}
