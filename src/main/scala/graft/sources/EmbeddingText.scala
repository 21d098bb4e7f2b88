package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-format word-embedding source — the `word v1 v2 ...` one-line-per-
  * token format the reference accepts for its vectors input
  * (mllib/src/main/scala/text/Word2VecApplier.scala:94-98).
  *
  * Distributed scan: `spark.read.text` line-splits the files across tasks,
  * the split/cast runs inside whole-stage codegen, and the result is a
  * plain (token, vector) DataFrame ready to broadcast-join or hash-join
  * against a token column. Lines with fewer than two coordinates are
  * dropped (the reference's `a.size > 2` filter); lines with a
  * non-numeric coordinate are dropped too (the reference's `toDouble`
  * would crash the job — a silent skip-and-continue is the behavior a
  * 100 TB ingest actually wants, and the count delta is observable).
  */
object EmbeddingText {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), " ").as("a"))
      .where(size(col("a")) > 2)
      .select(col("a").getItem(0).as("token"),
        // try_cast, not cast: ANSI mode would throw on the first malformed
        // coordinate; NULL + the exists-filter below skips the line instead
        expr("transform(slice(a, 2, size(a) - 1), x -> try_cast(x AS double))")
          .as("vector"))
      .where(expr("!exists(vector, x -> x IS NULL)"))

  /** Writer counterpart (round-trips through [[read]]): one line per token,
    * coordinates space-joined. Doubles print via Spark's cast-to-string, so
    * a write→read round trip is value-exact. Rejects vectors the reader's
    * `size > 2` line filter (reference parity) would silently drop — a
    * 1-dim lexicon must fail loudly at write, not vanish at read. */
  def write(df: DataFrame, tokenCol: String, vectorCol: String, path: String): Unit =
    df.withColumn(vectorCol,
        // isNull must be explicit: size(NULL) is NULL, which would fall
        // through when() to otherwise() and the token-only line would then
        // vanish silently at read — the exact failure this guard exists for
        when(col(vectorCol).isNull || size(col(vectorCol)) < 2, raise_error(lit(
          s"EmbeddingText.write: vectors must be non-null with >= 2 dims " +
            s"(the text format's reader drops shorter lines)")))
          .otherwise(col(vectorCol)))
      .select(concat_ws(" ", col(tokenCol),
        concat_ws(" ", expr(s"transform($vectorCol, x -> cast(x AS string))")))
        .as("value"))
      .write.mode("overwrite").text(path)
}
