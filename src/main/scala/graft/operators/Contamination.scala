package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (public technique: the
  * n-gram-overlap checks described in the GPT-3 §C / PaLM appendices):
  * flag training documents that share word n-grams with an evaluation
  * benchmark, so they can be dropped or quarantined before training.
  *
  * Shape: distinct n-grams per training doc (explode), distinct n-grams of
  * the WHOLE benchmark (its total gram set is small — thousands of eval
  * items), equi-join on the gram, per-doc overlap count. Catalyst
  * broadcasts the benchmark gram set at any realistic size, so the train
  * side streams through one map-side join plus a single per-doc aggregate —
  * no train-vs-train pairing ever happens, which is what keeps this linear
  * at 100 TB while dd03/dd05 handle the quadratic-risk dedup cases. */
object Contamination {

  /** Per-training-doc overlap report against a benchmark corpus.
    *
    * Output: one row per training doc with `n_grams` (its distinct n-gram
    * count), `n_overlap` (how many of those appear anywhere in the
    * benchmark), and `contaminated` (n_overlap >= minOverlap). Documents
    * shorter than `n` tokens degrade to one whole-document gram (same
    * convention as [[Dedup.ngramJaccardPairs]]).
    */
  def overlapReport(train: DataFrame, trainId: String, trainText: String,
                    bench: DataFrame, benchText: String,
                    n: Int = 8, minOverlap: Int = 1): DataFrame = {
    def gramsOf(df: DataFrame, textCol: String, keep: Seq[String]): DataFrame =
      df.select(keep.map(col) :+ split(col(textCol), " ").as("_w_"): _*)
        .select(keep.map(col) :+ explode(expr(
          s"array_distinct(transform(sequence(1, greatest(size(_w_) - ${n - 1}, 1)), i -> array_join(slice(_w_, i, $n), ' ')))"))
          .as("_gram_"): _*)

    val tg = gramsOf(train, trainText, Seq(trainId))
    val bg = gramsOf(bench, benchText, Seq.empty).distinct()
    val sizes = tg.groupBy(trainId).agg(count(lit(1)).as("n_grams"))
    // tg is distinct per doc already, so a plain count after the join IS the
    // distinct-overlap count; bench grams join broadcast (small by nature)
    val hits = tg.join(F.broadcast(bg), "_gram_")
      .groupBy(trainId).agg(count(lit(1)).as("n_overlap"))
    sizes.join(hits, Seq(trainId), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** Exact-substring contamination: a training doc is flagged when any
    * benchmark snippet appears VERBATIM inside it — the stricter
    * companion to [[overlapReport]]'s n-gram measure (the form used for
    * canary strings and verbatim answer leakage, where token-level
    * overlap is too forgiving).
    *
    * Scale: snippets broadcast (benchmark-sized, tiny next to the
    * corpus); the scan is one pass over training text. The per-row cost
    * is |snippets| substring searches — at a real snippet count compile
    * the broadcast set into one Aho-Corasick automaton inside a
    * mapPartitions (same output, one pass per char); the declarative
    * contains-join below IS that semantics and keeps the oracle gate.
    * Output: (trainId, n_hits, contaminated). */
  def exactContainsReport(train: DataFrame, trainId: String,
                          trainText: String, snippets: DataFrame,
                          snippetCol: String): DataFrame = {
    val sn = snippets.select(col(snippetCol).as("_sn_")).distinct()
    val hits = train.select(col(trainId), col(trainText).as("_t_"))
      .crossJoin(F.broadcast(sn))
      .where(col("_t_").contains(col("_sn_")))
      .groupBy(trainId).agg(count(lit(1)).as("n_hits"))
    train.select(col(trainId))
      .join(hits, Seq(trainId), "left")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
