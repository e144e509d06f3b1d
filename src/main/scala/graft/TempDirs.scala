package graft

import java.nio.file.{Files, Path}

/** Scratch-directory registry for queries that materialize temp stores
  * in-body (the s14/dx08 stored-index convention writes a FactTable or
  * parquet copy per invocation so the serving path under test reads a
  * REAL store).
  *
  * Two leaks this fixes (ADVICE r11): a bench/scale loop invoking the
  * same query N times piled N store copies into /tmp until the JVM
  * died, and nothing deleted them even then. `scratch(key)` returns a
  * FRESH directory per call (append-lifecycle queries rely on starting
  * empty) but deletes the PREVIOUS directory registered under the same
  * key — bounding live copies to one per (query, store) — and a JVM
  * shutdown hook removes whatever is still registered at exit.
  *
  * Safety: callers consume each invocation's result fully before
  * re-invoking the same query (Verify writes parquet per query; Bench
  * counts per iteration), so the previous store is never still being
  * read when its successor's scratch() call deletes it. Keys are
  * query-scoped, so distinct queries never interfere.
  */
object TempDirs {
  private val byKey =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import scala.jdk.CollectionConverters._
    byKey.values().asScala.foreach(deleteRecursively)
  }))

  /** A fresh scratch dir for `key`, deleting the previous dir issued
    * under the same key. Returns the path as a String (FactTable/parquet
    * roots take strings).
    */
  def scratch(key: String): String = {
    val fresh = Files.createTempDirectory(key)
    val prev = byKey.put(key, fresh)
    if (prev != null) deleteRecursively(prev)
    fresh.toString
  }
}
