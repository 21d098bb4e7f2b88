package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-cardinality sketch — the mergeable,
  * engine-portable answer to "how many distinct X per group" at 100 TB.
  *
  * Exact `countDistinct` shuffles every distinct value; Spark's own
  * `approx_count_distinct` (HLL++) is cheap but its register layout is
  * engine-private, so no oracle can replay it. KMV keeps the k smallest
  * 63-bit `mix64` hashes per group: the k-th smallest hash `hk` estimates
  * density, `est = (k-1) · 2^63 / hk` (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002) with relative error
  * ~1/√(k−2). Everything up to the final division is integer, and the
  * division is one correctly-rounded IEEE op on exactly-representable
  * inputs ((k−1)·2^63 is a small-int × power-of-two), so a SQL replay is
  * bit-identical.
  *
  * Mergeability is free by construction: the sketch of a union is the
  * k smallest of the concatenated hash sets — union the inputs (or the
  * kept hash rows) and re-apply. No float state, no register merge.
  *
  * Plan shape: one distinct (map-side partial) on (group, hash), then a
  * rank-≤-k window that Spark's WindowGroupLimit rewrites into
  * per-partition top-k BEFORE the shuffle — so only k·partitions hash
  * rows ever move, not the distinct set. That is the whole point at
  * scale: cardinality of a 10^11-row column for the cost of shipping
  * k longs per partition.
  */
object Sketch {

  /** JVM splitmix64 finalizer (same stream as `Sampling`); its udf wrapper
    * is deterministic so Catalyst neither re-executes nor reorders it. */
  private val mixUdf = udf { (x: Long) => graft.functions.TextKernels.mix64(x) }

  /** Per-group distinct-count estimate of `idCol` with a k-minimum-values
    * sketch. Output: `(groupCol, n_kept, estimate)` where `n_kept` ≤ k is
    * the sketch size and `estimate` is exact (= n_kept) for groups with
    * fewer than k distinct values — the sketch degrades to an exact
    * distinct count below its resolution, by definition. */
  def kmvDistinct(df: DataFrame, groupCol: String, idCol: String,
                  k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val h = shiftrightunsigned(mixUdf(col(idCol).cast("long")), 1)
    val hashes = df.select(col(groupCol), h.as("_h_")).distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_h_"))
    hashes.withColumn("_rn_", row_number().over(w))
      .where(col("_rn_") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("_rn_") === k, col("_h_"))).as("_hk_"))
      .select(col(groupCol), col("n_kept"),
        when(col("_hk_").isNull, col("n_kept").cast("double"))
          .otherwise((lit((k - 1).toDouble) * lit(9.223372036854775808e18))
            / col("_hk_").cast("double"))
          .as("estimate"))
  }
}
