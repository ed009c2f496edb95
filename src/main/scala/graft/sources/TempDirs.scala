package graft.sources

import java.nio.file.{Files, Path}

/** JVM-lifetime registry of fixture temp directories. Fixture trees are
  * memoized per JVM (one build per session), so the natural reclaim point
  * is JVM exit — without this every sbt/driver invocation leaks its
  * ~25 MB binary-fixture tree into /tmp. */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach(p => deleteTree(p))
  }, "graft-tempdir-sweep"))

  /** Register `dir` for deletion at JVM exit; returns it for chaining. */
  def register(dir: Path): Path = { registered.add(dir); dir }

  /** Best-effort recursive delete (also used by fixture failure paths). */
  def deleteTree(root: Path): Unit = {
    val f = root.toFile
    Option(f.listFiles()).foreach(_.foreach(c => deleteTree(c.toPath)))
    f.delete(): Unit
  }
}
