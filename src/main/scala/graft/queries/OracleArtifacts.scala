package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit, sum}

/** Shared plumbing for oracle gates that round-trip a JSON artifact
  * through /tmp (the tp01/tp03 structural-split recipe): the Spark side
  * writes the model's discrete projection, DuckDB independently
  * recomputes the aggregate from disk, and the float remainder is pinned
  * as a `scores_ok` boolean. Used by tp01/tp02/tp03/gp01/ug01. */
object OracleArtifacts {

  /** Per-run namespace token: two concurrent verify/bench runs at the
    * same scale factor must not clobber each other's artifacts mid-gate
    * (r16 ADVICE). The Spark side (queries) and the oracle SQL (dumped
    * by the SAME Verify JVM) both interpolate it, so the DuckDB re-read
    * always targets the artifacts this process wrote. Override with
    * GRAFT_RUN_ID to share artifacts across processes deliberately. */
  val runToken: String =
    sys.env.getOrElse("GRAFT_RUN_ID", ProcessHandle.current().pid().toString)

  /** `/tmp/graft_<tag>_r<token>/<slug>` — every artifact-writing gate
    * routes through here. Per-run dirs cannot be deleted on JVM exit
    * (the driver's DuckDB oracle reads them AFTER the Verify JVM
    * exits), so accumulation is bounded instead by sweeping SIBLING
    * run dirs for the same tag whose mtime is older than 6 hours —
    * far beyond any live verify/bench run, far short of filling /tmp
    * on a machine running rounds repeatedly. */
  def artDir(tag: String, slug: String): String = {
    sweepStale(tag)
    s"/tmp/graft_${tag}_r$runToken/$slug"
  }

  private val StaleMs = 6L * 3600 * 1000

  private def sweepStale(tag: String): Unit = {
    val tmp = new java.io.File("/tmp")
    val prefix = s"graft_${tag}_r"
    val cutoff = System.currentTimeMillis() - StaleMs
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.startsWith(prefix) &&
          f.getName != s"$prefix$runToken" && f.lastModified() < cutoff)
        deleteRecursively(f)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** Float-remainder comparison for artifact round-trip sums: the two
    * sums come from different plans (single re-read JSON file vs cached
    * partitioned frame), so summation order differs and exact equality
    * on a rounded double can flake at a rounding boundary (r16 ADVICE).
    * Relative-epsilon instead — far wider than reordering error, far
    * tighter than any real artifact corruption (a dropped/mangled row
    * moves the sum by ~a whole score). */
  def sumsClose(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  /** The whole float-half gate in one place: write `df` as a single JSON
    * artifact to `path`, re-read it, and certify the re-read `valCol`
    * sum epsilon-matches the in-memory sum (see [[sumsClose]]). Every
    * artifact gate's `scores_ok` routes through here so the epsilon
    * contract lives in exactly one place. `df` should be persisted by
    * the caller (it is re-scanned for the in-memory sum). */
  def writeAndCheckSum(df: DataFrame, valCol: String, path: String): Boolean = {
    // r20: no coalesce(1) — it serialized the whole artifact through ONE
    // task (tp01's sf10 assignment write ran 500k rows single-threaded).
    // Every artifact oracle reads a '/*.json' glob and DuckDB's
    // read_json_auto skips empty part files, so the parallel multi-file
    // layout is contract-identical; the epsilon sum check below is
    // summation-order-tolerant by design.
    df.write.mode("overwrite").json(path)
    def sumOf(d: DataFrame): Double = d
      .agg(coalesce(sum(col(valCol)), lit(0.0))).collect()(0).getDouble(0)
    sumsClose(sumOf(df.sparkSession.read.json(path)), sumOf(df))
  }
}
