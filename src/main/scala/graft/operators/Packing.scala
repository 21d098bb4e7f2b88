package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence preparation for LLM training: split long documents into
  * token-window chunks, and pack a token stream into fixed-length training
  * sequences. Both are deterministic array/window programs — no UDFs — so
  * they replay exactly in a SQL oracle.
  */
object Packing {

  /** Split each document into chunks of `chunkTokens` whitespace tokens,
    * consecutive chunks overlapping by `overlap` tokens (the sliding-window
    * context-preservation trick). Output: one row per chunk with
    * `chunk_index` (0-based) and `chunk_text`; a document shorter than one
    * chunk yields exactly its own text. Pure per-row explode — shuffle-free,
    * linear at any corpus size. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val stride = chunkTokens - overlap
    df.select(col(idCol), split(col(textCol), " ").as("_w_"))
      // chunk starts: 1, 1+stride, ... while start <= len (so a final
      // partial window is kept); integer ceil-div keeps the count
      // bit-portable to any SQL engine (no float rounding at boundaries)
      .withColumn("_nc_", greatest(lit(1),
        expr(s"(size(_w_) - $overlap + ${stride - 1}) div $stride").cast("int")))
      .select(col(idCol), col("_w_"),
        explode(expr(s"sequence(0, _nc_ - 1)")).as("chunk_index"))
      .select(col(idCol), col("chunk_index"),
        expr(s"array_join(slice(_w_, chunk_index * $stride + 1, $chunkTokens), ' ')")
          .as("chunk_text"))
  }

  /** Pack a token-counted stream into fixed-`seqLen` training sequences by
    * the concat-and-chunk rule: documents are laid end to end in `idCol`
    * order and the token stream is cut every `seqLen` tokens; a document's
    * `seq_id` is the sequence its FIRST token lands in. Output adds
    * `seq_id` and `seq_offset` (the document's start position within its
    * sequence).
    *
    * Scale: the running sum is a single global window — one sequential
    * pass. A 100 TB run packs per shard instead (each shard's stream cut
    * independently, boundaries stitched by offsetting with the per-shard
    * token totals — the same two-phase quota split pp01 documents); the
    * per-document arithmetic is identical, so this operator IS the
    * shard-local step of that plan. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum_", sum(col(tokensCol)).over(w))
      .withColumn("_start_", col("_cum_") - col(tokensCol))
      // integer `div`, not `/`: double division loses exactness past 2^53
      // cumulative tokens, and this module's contract is bit-portability
      // at any magnitude
      .withColumn("seq_id", expr(s"_start_ div $seqLen").cast("long"))
      .withColumn("seq_offset", (col("_start_") % seqLen).cast("long"))
      .drop("_cum_", "_start_")
  }
}
