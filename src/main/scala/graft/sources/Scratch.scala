package graft.sources

import org.apache.spark.sql.SparkSession

/** App-scoped scratch locations (`/tmp/graft_<kind>/<appId>/...`) with
  * end-of-JVM cleanup. Queries that stage files (shapefile round-trip,
  * bucketed tables, CSV/embedding-text scans) write under a root handed out
  * here; a single shutdown hook recursively deletes every root and drops
  * every registered catalog table. The app-unique tag is what makes
  * concurrent harness runs race-free, but it also means a later run can
  * never identify an earlier run's leftovers — so cleanup has to happen at
  * the end of the owning JVM, not lazily at the start of the next one. */
object Scratch {
  private val roots = scala.collection.mutable.LinkedHashSet.empty[String]
  private val tables = scala.collection.mutable.LinkedHashSet.empty[(SparkSession, String)]
  @volatile private var hooked = false

  private def ensureHook(): Unit = if (!hooked) {
    Runtime.getRuntime.addShutdownHook(new Thread(() => cleanup()))
    hooked = true
  }

  /** A per-(kind, app, tag) scratch dir, created on first use and deleted
    * (whole app-scoped root) at JVM exit. */
  def dir(s: SparkSession, kind: String, tag: String): String = synchronized {
    ensureHook()
    val root = s"/tmp/graft_$kind/${s.sparkContext.applicationId}"
    roots += root
    val d = s"$root/" + tag.replaceAll("[^A-Za-z0-9]", "_")
    new java.io.File(d).mkdirs()
    d
  }

  /** Cheap content stamp of source files/dirs (total length + newest
    * mtime, avalanche-mixed): include in a [[sharedDir]] tag so a staged
    * derivation can never outlive a regenerated source — if the inputs
    * are rewritten in place, the tag changes and a fresh stage is built. */
  def fingerprint(paths: String*): String = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty[java.io.File]).map(walk)
          .foldLeft((0L, 0L)) { case ((a, b), (c, dd)) => (a + c, math.max(b, dd)) }
      else (f.length, f.lastModified)
    val (len, mt) = paths.map(p => walk(new java.io.File(p)))
      .foldLeft((0L, 0L)) { case ((a, b), (c, dd)) => (a + c, math.max(b, dd)) }
    java.lang.Long.toHexString(graft.functions.TextKernels.mix64(len * 31 + mt))
  }

  /** A SHARED staging dir reused across JVM runs, published atomically.
    *
    * Some queries stage immutable derived files (the streaming sources'
    * landing dirs) whose content is a pure function of (kind, tag) — paying
    * the staging write once per app run just to be race-safe billed ~1-2 s
    * to every bench pass. This gives the safe shared variant: build into a
    * run-private `.tmp-<uuid>` sibling, then `renameTo` the target — atomic
    * on the local POSIX /tmp these roots live on. Whoever wins the rename
    * publishes; a loser (target appeared concurrently) discards its build
    * and reads the winner's. Readers only ever see complete dirs.
    *
    * The tag must version the CONTENT (bump it when the staged layout
    * changes, and include [[fingerprint]] of the inputs so in-place source
    * regeneration re-stages) because an existing target is trusted as-is.
    * Shared targets are deliberately NOT cleaned at JVM exit — reuse is
    * the point; they are bounded (one dir per tag content-version) and
    * /tmp-local. Orphaned tmp dirs from a crashed build are registered for
    * this JVM's exit cleanup. */
  def sharedDir(kind: String, tag: String)(build: String => Unit): String = {
    val root = new java.io.File(s"/tmp/graft_shared_$kind")
    root.mkdirs()
    val target = new java.io.File(root, tag.replaceAll("[^A-Za-z0-9]", "_"))
    if (target.isDirectory) return target.getPath
    val tmp = new java.io.File(root, s".tmp-${java.util.UUID.randomUUID}")
    synchronized { ensureHook(); roots += tmp.getPath }
    build(tmp.getPath)
    if (!tmp.renameTo(target)) {
      try deleteRec(tmp) catch { case _: Throwable => () }
      require(target.isDirectory,
        s"Scratch.sharedDir: rename to $target failed and no winner exists")
    }
    target.getPath
  }

  /** Register a catalog table for a best-effort DROP at JVM exit. The hook
    * races Spark's own shutdown (a stopped context makes the DROP a no-op,
    * swallowed below), but the harness catalog is in-memory — entries die
    * with the JVM regardless — and the tables' DATA files live under a
    * registered Scratch root, so the file-delete path below is what
    * actually reclaims the space. */
  def registerTable(s: SparkSession, name: String): Unit = synchronized {
    ensureHook()
    tables += ((s, name))
  }

  private def cleanup(): Unit = synchronized {
    tables.foreach { case (s, t) =>
      try s.sql(s"DROP TABLE IF EXISTS $t") catch { case _: Throwable => () }
    }
    roots.foreach { r =>
      try deleteRec(new java.io.File(r)) catch { case _: Throwable => () }
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRec))
    f.delete()
    ()
  }
}
