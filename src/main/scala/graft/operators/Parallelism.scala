package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan widening (optimization round 19, guide §2.5's
  * "input skew: one unsplittable file → repartition immediately after
  * the read").
  *
  * The bench corpus ships each table as ONE single-row-group parquet
  * file, so every scan is one input split no matter the split-size
  * configs — and any CPU-heavy per-row derivation planned into the scan
  * stage (n-gram explosion + hashing, tokenization, media decode) runs
  * in ONE task while the other cores idle (job-profiled on dd05: the
  * gram stage held 1 task for 1.4 s of a 6 s query). At cluster scale
  * the same operators read many-split inputs and the problem does not
  * exist — which is exactly the condition this helper keys on: it
  * hash-repartitions to `spark.default.parallelism` ONLY when the
  * input's planned partition count is under half the available slots,
  * so on a well-split 100 TB scan it is a no-op by construction (never
  * a constant tuned for local mode; the decision derives from the scan
  * layout vs the cluster's slots, both runtime facts).
  *
  * The repartition hashes on caller-chosen key columns — deterministic
  * row→partition assignment under task retries (guide §2.5 warns off
  * round-robin/rand-derived keys), and the exchange carries only the
  * caller's already-projected columns. Callers pick a key that spreads
  * (a row id), and apply this BEFORE the expensive derivation so the
  * shuffle moves the narrow input rows, not the exploded output. */
object Parallelism {

  def widen(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "widen needs at least one hash key column")
    val slots = df.sparkSession.sparkContext.defaultParallelism
    // physical planning only (no job): the scan's split count
    val planned = df.rdd.getNumPartitions
    if (planned * 2 <= slots) df.repartition(slots, keys: _*) else df
  }
}
