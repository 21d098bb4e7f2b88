package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding quantization — the memory/IO lever of the 100 TB ANN tier: a
  * float32 corpus scanned as int8 is 4× less disk and cache, which is the
  * difference between an in-memory rerank and a spill at real embedding
  * dims. Symmetric per-vector int8 (the faiss `SQ8`-style scheme, public):
  * `scale = max |v_i|`, `q_i = round(127 * v_i / scale)` ∈ [-127, 127].
  *
  * Everything here is integer-or-IEEE-exact and engine-portable: the
  * float→double widening is exact, both engines round ties away from
  * zero, and the quantized dot product is pure int64 arithmetic — so the
  * whole tier (codes AND top-k ordering) replays in a SQL oracle with no
  * float-comparison fragility, unlike a float-scored ANN.
  *
  * Pure per-row Columns (codegen'd, shuffle-free) for the codes; the
  * top-k is one equi-free broadcast join at demo scale with the IVF/LSH
  * cell-join recipe ([[Similarity]]) as the documented scale path —
  * quantization composes with either: the cell join prunes candidates,
  * int8 scores them.
  */
object Quantize {

  /** Adds `scale` (double, the per-vector max-abs) and `qvec`
    * (array<int>, the int8 codes widened to int). A zero vector gets
    * scale 0 and all-zero codes.
    *
    * Dirty vectors raise BY NAME (round 17): a NULL vector, a NULL
    * component, or a non-finite component used to flow through silently —
    * `array_max` IGNORES nulls, so a null component was invisible in the
    * scale while its code came out NULL, which then nulled the whole int64
    * dot product downstream and parked the vector at the bottom of every
    * top-k; NaN/Inf scales zeroed or nulled every code. Quantized garbage
    * is indistinguishable from real codes, so refuse at the encode. */
  def int8Symmetric(df: DataFrame, vecCol: String): DataFrame = {
    // empty arrays are dirty too (array_max(empty) = NULL scale → NULL
    // codes downstream), and Inf is matched EXACTLY — a magnitude
    // threshold would misname legitimate finite doubles near 1.8e308
    val dirty = col(vecCol).isNull || size(col(vecCol)) === 0 ||
      exists(col(vecCol), x => x.isNull || isnan(x.cast("double")) ||
        x.cast("double") === lit(Double.PositiveInfinity) ||
        x.cast("double") === lit(Double.NegativeInfinity))
    df.withColumn("scale",
      when(dirty, raise_error(lit(
        s"Quantize.int8Symmetric: '$vecCol' is NULL/empty or contains a " +
          "NULL/NaN/Inf component — clean or impute embeddings upstream " +
          "(codes quantized from a dirty vector are silent garbage)"))
        .cast("double"))
        .otherwise(array_max(transform(col(vecCol), x => abs(x.cast("double"))))))
      .withColumn("qvec",
        when(col("scale") === 0d,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol), x =>
            // clamp is identity for every clean row (|code| <= 127 by
            // construction) — it exists so ANSI's cast-overflow can never
            // fire first on a dirty row and shadow the named raise above
            // (constant folding evaluates this branch eagerly on literal
            // inputs, before the runtime when() ordering applies)
            least(greatest(round(x.cast("double") * lit(127.0) / col("scale")),
              lit(-127.0)), lit(127.0)).cast("int"))))
  }

  /** Per-vector quantization report: dims, an index-weighted integer
    * checksum of the codes (order-sensitive, so any code or position
    * drift is caught), code sum, and max |code| (≤ 127 by construction —
    * the saturation invariant). All integer outputs — hash-stable. */
  def int8Report(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    int8Symmetric(df, vecCol).select(
      col(idCol),
      size(col("qvec")).as("n_dims"),
      col("scale"),
      expr("aggregate(sequence(1, size(qvec)), 0L, " +
        "(acc, i) -> acc + cast(qvec[i-1] * i as bigint))").as("q_checksum"),
      expr("aggregate(qvec, 0L, (acc, x) -> acc + cast(x as bigint))")
        .as("q_sum"),
      expr("aggregate(qvec, 0, (acc, x) -> greatest(acc, abs(x)))")
        .as("q_max_abs"))

  /** Top-k nearest neighbors under the QUANTIZED dot product — int64
    * scores, `(score desc, neighbor_id)` total order, self-matches
    * excluded. The ordering is exactly reproducible anywhere (no float
    * comparator), which is what makes a compressed-corpus rerank safe to
    * re-run on retry at scale. Broadcast-join all-pairs at demo scale;
    * compose with [[Similarity.ivfTopK]]'s cell join to prune candidates
    * first when the corpus doesn't broadcast. */
  def int8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
               vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // loud small-corpus contract (the cosineNearDupPairs(exact=true)
    // precedent): this lane broadcasts the whole quantized corpus by
    // design; at 100 TB that is a broadcast OOM hours in, so refuse by
    // name first and point at the pruned compose path. The probe is
    // limit-bounded: a full count() would itself execute the oversized
    // corpus lineage end to end just to learn it is too big
    val bound = 1L << 21
    val over = corpus.limit((bound + 1).toInt).count() > bound
    require(!over,
      s"Quantize.int8TopK broadcasts the corpus; it exceeds the " +
        "2^21 small-corpus bound — prune candidates with " +
        "Similarity.ivfTopK's cell join first, then int8-score the " +
        "surviving pairs")
    val q = int8Symmetric(queries, vecCol)
      .select(col(idCol).as("query_id"), col("qvec").as("_qa_"))
    val c = int8Symmetric(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qvec").as("_qb_"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", expr(
        "aggregate(zip_with(_qa_, _qb_, (a, b) -> cast(a as bigint) * b), " +
          "0L, (acc, x) -> acc + x)"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }
}
