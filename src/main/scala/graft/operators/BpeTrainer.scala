package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (public algorithm: Sennrich et
  * al. '16): start from characters, repeatedly merge the most frequent
  * adjacent symbol pair. The classic trainer operates on the corpus's
  * WORD-FREQUENCY table, not raw text — computing that table is the
  * distributed part (one groupBy over the corpus), after which each merge
  * round is a weighted pair count + a vocabulary rewrite over the distinct
  * words only. That is exactly the shape here: rounds are driver-
  * coordinated (one 1-row collect per round, like IVF's Lloyd iterations),
  * all counting/rewriting is distributed.
  *
  * The greedy leftmost merge application is written as a portable
  * fold-over-symbols (separator-delimited string accumulator, see
  * [[mergeExpr]]) — the SAME formula a SQL oracle replays verbatim, which
  * is what lets the driver hash-gate the learned merge table.
  */
object BpeTrainer {

  /** One learned merge: left + right symbol and the weighted pair count
    * that won the round. */
  case class Merge(rank: Int, left: String, right: String, n: Long)

  // symbols are embedded as Spark SQL single-quoted literals: escape the
  // backslash too (Spark string literals process \-escapes, unlike the
  // quote-only rule of standard SQL)
  private def sqlLit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")

  /** Greedy leftmost application of merge (l, r) to a ``-separated
    * symbol string, as a fold: appending `r` WITHOUT a separator turns a
    * trailing `l` token into `lr`. The suffix check `sep||l` (or the
    * accumulator being exactly `l`) is what stops a longer symbol that
    * merely ENDS in `l` from merging. */
  private def mergeExpr(l: String, r: String): String = {
    val (ll, rl) = (sqlLit(l), sqlLit(r))
    s"""split(aggregate(_syms_, cast('' as string), (acc, x) ->
       |  CASE WHEN x = '$rl' AND (acc = '$ll'
       |            OR right(acc, ${l.length + 1}) = concat(char(31), '$ll'))
       |       THEN concat(acc, '$rl')
       |       WHEN acc = '' THEN x
       |       ELSE concat(acc, char(31), x) END), char(31))""".stripMargin
  }

  /** Learn `numMerges` merges from the whitespace-token stream of
    * `textCol`. Stops early if no adjacent pair remains. */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    var syms = df
      .select(explode(split(col(textCol), "\\s+")).as("_w_"))
      .where(col("_w_") =!= "")
      .groupBy("_w_").agg(count(lit(1)).as("_freq_"))
      .select(col("_freq_"),
        expr("transform(sequence(1, length(_w_)), i -> substring(_w_, i, 1))")
          .as("_syms_"))
      .persist()
    syms.count()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // adjacent pairs via zipped slices (NOT sequence(1, n-1): Spark's
      // sequence runs DESCENDING when stop < start, so 1-symbol words
      // would fabricate a [1,0] index pair)
      val top = syms.select(col("_freq_"), explode(expr(
          """zip_with(slice(_syms_, 1, size(_syms_) - 1),
            |         slice(_syms_, 2, size(_syms_) - 1),
            |         (a, b) -> named_struct('l', a, 'r', b))""".stripMargin))
          .as("_p_"))
        .select(col("_p_.l").as("l"), col("_p_.r").as("r"), col("_freq_"))
        .groupBy("l", "r").agg(sum("_freq_").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, c)
        val next = syms
          .withColumn("_syms_", expr(mergeExpr(l, r)))
          .persist()
        next.count()
        syms.unpersist()
        syms = next
        rank += 1
      }
    }
    syms.unpersist()
    merges.result()
  }

  /** The learned merge table as a DataFrame (rank, left, right, n). */
  def trainTable(spark: SparkSession, df: DataFrame, textCol: String,
                 numMerges: Int): DataFrame = {
    import spark.implicits._
    train(df, textCol, numMerges).toDF("rank", "left", "right", "n")
  }

  /** Apply learned merges (in rank order) and count BPE pieces per row:
    * segmentation runs once per DISTINCT word (the vocabulary, tiny next
    * to the corpus), then joins back to the token stream — the same
    * vocabulary-table shortcut training uses. Output: (idCol,
    * bpe_pieces). */
  def segmentCounts(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[Merge]): DataFrame = {
    val words = df
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("_w_"))
      .where(col("_w_") =!= "")
    var vocab = words.select("_w_").distinct()
      .withColumn("_syms_",
        expr("transform(sequence(1, length(_w_)), i -> substring(_w_, i, 1))"))
    merges.sortBy(_.rank).foreach { m =>
      vocab = vocab.withColumn("_syms_", expr(mergeExpr(m.left, m.right)))
    }
    val pieces = vocab.select(col("_w_"), size(col("_syms_")).as("_np_"))
    words.join(pieces, "_w_")
      .groupBy(idCol).agg(sum(col("_np_").cast("long")).as("bpe_pieces"))
  }
}
