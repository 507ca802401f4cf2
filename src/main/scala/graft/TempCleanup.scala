package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** JVM-exit cleanup for the app-unique /tmp artifacts the round-trip
  * queries write (fvecs/hdf5 files, exported index directories).
  * App-unique names keep concurrent runs from clobbering each other's
  * file mid-read, but without cleanup repeated bench/verify runs
  * accumulate multi-MB files in /tmp without bound — so every such
  * path registers here for best-effort recursive deletion at exit.
  */
object TempCleanup {
  private val registered = scala.collection.mutable.LinkedHashSet.empty[String]

  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.synchronized(registered.toVector).foreach { p =>
        try {
          val path = Paths.get(p)
          if (Files.isDirectory(path)) {
            val walk = Files.walk(path)
            try walk.sorted(Comparator.reverseOrder[Path]())
              .forEach(f => { Files.deleteIfExists(f); () })
            finally walk.close()
          } else Files.deleteIfExists(path)
        } catch { case _: Exception => () } // exit cleanup must never throw
      }
    }, "graft-tmp-cleanup"))

  /** Register a file or directory for deletion at JVM exit; returns
    * the path unchanged so call sites can wrap their path literal. */
  def onExit(path: String): String = {
    hook
    registered.synchronized { registered += path }
    path
  }
}
