package graft.queries

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
    * routes through here. */
  def artDir(tag: String, slug: String): String =
    s"/tmp/graft_${tag}_r$runToken/$slug"

  /** Float-remainder comparison for artifact round-trip sums: the two
    * sums come from different plans (single re-read JSON file vs cached
    * partitioned frame), so summation order differs and exact equality
    * on a rounded double can flake at a rounding boundary (r16 ADVICE).
    * Relative-epsilon instead — far wider than reordering error, far
    * tighter than any real artifact corruption (a dropped/mangled row
    * moves the sum by ~a whole score). */
  def sumsClose(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
}
