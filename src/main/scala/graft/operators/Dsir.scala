package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextKernels

/** DSIR — Data Selection via Importance Resampling (Xie et al. '23,
  * public technique): score every raw document by how much its hashed
  * bag-of-words distribution looks like a TARGET domain versus the raw
  * SOURCE pool, then sample proportionally to the importance weight.
  * This is the standard published recipe for skewing a 100 TB crawl
  * toward a high-quality target (e.g. "looks like English reference
  * text") without training a classifier.
  *
  * Model: tokens hash into `buckets` feature buckets; target and source
  * are bag-of-buckets multinomials with add-1 smoothing; a document's
  * log importance weight is Σ_tokens ln(p_target(b) / p_source(b)).
  *
  * Scale shape: ONE map-side-combinable aggregate over the exploded
  * token stream builds the model (`buckets` rows — model-sized, the
  * driver collect is bounded by construction), then ONE shuffle-free
  * map scores every document against the broadcast log-ratio table.
  * Nothing in the plan grows with corpus size except the linear scan.
  *
  * Determinism/oracle story: bucket = polyHash64Mixed(token) unsigned
  * mod `buckets` (the dd03/dd04 replayable hash); counts are exact
  * integers; each per-token ln sees the identical double ratio in any
  * engine (integer products < 2^53, one IEEE division); the per-doc sum
  * folds in token order (a deterministic foldLeft here, list_reduce in
  * the oracle) — no shuffle-order float nondeterminism anywhere.
  */
object Dsir {

  /** (idCol, weight): per-document log importance weight of the target
    * distribution (rows where `isTarget`) against the whole of `df`. */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bucketOf = (t: String) =>
      java.lang.Long.remainderUnsigned(
        TextKernels.polyHash64Mixed(t), buckets.toLong).toInt
    // NULL text scores like empty text — zero tokens, weight 0.0 (the
    // neutral log-ratio), instead of the bare executor NPE it used to be
    val bucketsUdf = udf { (text: String) =>
      if (text == null) Array.empty[Int]
      else text.split(" ", -1).iterator.filter(_.nonEmpty).map(bucketOf).toArray
    }
    val toks = df.select(col(idCol).as("_id_"), isTarget.as("_tgt_"),
      bucketsUdf(col(textCol)).as("_bs_"))
    // model fit: one aggregate, `buckets` result rows (bounded collect)
    val stats = toks
      .select(explode(col("_bs_")).as("_b_"), col("_tgt_"))
      .groupBy("_b_")
      .agg(count(lit(1)).as("_s_"),
        sum(when(col("_tgt_"), 1L).otherwise(0L)).as("_t_"))
      .collect()
    val sCnt = Array.fill(buckets)(0L)
    val tCnt = Array.fill(buckets)(0L)
    stats.foreach { r =>
      val b = r.getInt(0); sCnt(b) = r.getLong(1); tCnt(b) = r.getLong(2)
    }
    val sTot = sCnt.sum
    val tTot = tCnt.sum
    // ln( p_t(b) / p_s(b) ) with add-1 smoothing, computed as ONE double
    // ratio so the oracle's expression tree matches term for term
    val lr = Array.tabulate(buckets) { b =>
      math.log(((tCnt(b) + 1.0) * (sTot + buckets)) /
        ((sCnt(b) + 1.0) * (tTot + buckets)))
    }
    val weightUdf = udf { (bs: Seq[Int]) =>
      var acc = 0.0
      bs.foreach { b => acc += lr(b) }
      acc
    }
    toks.select(col("_id_").as(idCol), weightUdf(col("_bs_")).as("weight"))
  }

  /** The resampling half of DSIR: draw `k` documents WITHOUT replacement
    * with probability ∝ exp(weight), via the Gumbel-max trick (public:
    * top-k of weight + Gumbel noise IS a without-replacement sample of
    * the softmax distribution). The noise is a pure function of
    * (id, seed) — splitmix64 high bits → u ∈ (0,1) → −ln(−ln u) — so the
    * sample is deterministic, retry-stable, and replayable by a SQL
    * oracle; this is the engine-portable form of the paper's
    * `np.random.gumbel`.
    *
    * Scale shape: one narrow map for the key, one global top-k — the
    * sort is k-bounded (TakeOrdered), never a full shuffle sort.
    * Returns (idCol, sample_key, rank), rank 1..k by descending key. */
  def resampleTopK(weights: DataFrame, idCol: String, weightCol: String,
                   k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val mixUdf = udf { (x: Long) => TextKernels.mix64(x) }
    val h = shiftrightunsigned(
      mixUdf(col(idCol).cast("long") + lit(seed * 0x9e3779b97f4a7c15L)), 11)
    val u = (h.cast("double") + 0.5) / 9007199254740992.0 // 2^53
    val gumbel = -log(-log(u))
    weights
      .withColumn("sample_key", col(weightCol) + gumbel)
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("sample_key").desc, col(idCol))))
      .select(col(idCol), col("sample_key"), col("rank"))
  }
}
