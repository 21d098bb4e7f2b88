package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextKernels

/** Multi-leg entity mention detection (reference
  * text/EntityCalculator.scala:127-157 `entityInText`/`matchingScore`):
  * an entity synonym is a sequence of "legs" (tokens); it matches at doc
  * position i when every leg j matches token i+j — exactly, or within
  * Levenshtein distance 1 for legs of length >= 4.
  *
  * Plan shape: inverted-index join on the FIRST leg (exact, simplified)
  * generates candidates; the remaining legs are verified by a kernel
  * against the doc's token array. Candidate volume is bounded by the first
  * leg's document frequency — choose the rarest leg first when building
  * entity tables at scale.
  */
object EntityMatcher {

  private def legMatches(tok: String, leg: String): Boolean =
    tok == leg || (leg.length >= 4 &&
      math.abs(tok.length - leg.length) <= 1 &&
      TextKernels.boundedLevenshtein(tok, leg, 1) <= 1)

  private val verifyUdf = udf { (tokens: Seq[String], pos: Int, legs: Seq[String]) =>
    legs.indices.forall { j =>
      pos + j < tokens.length && legMatches(
        TextKernels.simplify(tokens(pos + j)), legs(j))
    }
  }

  /** @param docs     (docId, tokens array<string>)
    * @param entities (tag string, entityIndex int, synonym array<string>)
    * @return (docId, tag, entityIndex, from, to) one row per mention */
  def matchEntities(docs: DataFrame, docIdCol: String, tokensCol: String,
                    entities: DataFrame): DataFrame = {
    val simp = udf((s: String) => TextKernels.simplify(s))
    val docToks = docs.select(col(docIdCol).as("_did_"), col(tokensCol).as("_toks_"),
        posexplode(col(tokensCol)).as(Seq("_pos_", "_tok_")))
      .withColumn("_tok_", simp(col("_tok_")))
    val legged = entities.select(col("tag"), col("entityIndex"),
        expr("transform(synonym, t -> lower(t))").as("_legs_"))
      .withColumn("_first_", expr("_legs_[0]"))
    docToks.join(legged, col("_tok_") === col("_first_"))
      .where(verifyUdf(col("_toks_"), col("_pos_"), col("_legs_")))
      .select(col("_did_").as(docIdCol), col("tag"), col("entityIndex"),
        col("_pos_").as("from"),
        (col("_pos_") + size(col("_legs_"))).as("to"))
  }
}
