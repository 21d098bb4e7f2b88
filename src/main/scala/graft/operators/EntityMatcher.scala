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
    tok != null && leg != null && (tok == leg || (leg.length >= 4 &&
      math.abs(tok.length - leg.length) <= 1 &&
      TextKernels.boundedLevenshtein(tok, leg, 1) <= 1))

  // tokens arrive pre-simplified (once per doc, below) — re-folding the
  // full array per candidate row was O(candidates * docLen) wasted work
  private val verifyUdf = udf { (tokens: Seq[String], pos: Int, legs: Seq[String]) =>
    legs.indices.forall { j =>
      pos + j < tokens.length && legMatches(tokens(pos + j), legs(j))
    }
  }

  // null-safe in both layers (round 17): a NULL token array or a NULL
  // element used to kill the job with a bare executor NPE — dirty rows
  // now flow as null (a NULL array yields no positions to match; a NULL
  // token can equal no leg), the same no-match SQL semantics the exact
  // candidate join already gives them
  private val simplifyArr = udf { (toks: Seq[String]) =>
    if (toks == null) null
    else toks.map(t => if (t == null) null else TextKernels.simplify(t))
  }

  /** @param docs     (docId, tokens array<string>)
    * @param entities (tag string, entityIndex int, synonym array<string>)
    * @return (docId, tag, entityIndex, from, to) one row per mention */
  def matchEntities(docs: DataFrame, docIdCol: String, tokensCol: String,
                    entities: DataFrame): DataFrame = {
    val docToks = docs
      .select(col(docIdCol).as("_did_"), simplifyArr(col(tokensCol)).as("_toks_"))
      .select(col("_did_"), col("_toks_"),
        posexplode(col("_toks_")).as(Seq("_pos_", "_tok_")))
    // legs go through the SAME simplify kernel as doc tokens (lowercase +
    // accent fold) — lower() alone left accented legs unable to ever equal
    // a folded doc token in the exact candidate join
    val legged = entities.select(col("tag"), col("entityIndex"),
        simplifyArr(col("synonym")).as("_legs_"))
      .withColumn("_first_", expr("_legs_[0]"))
    docToks.join(legged, col("_tok_") === col("_first_"))
      .where(verifyUdf(col("_toks_"), col("_pos_"), col("_legs_")))
      .select(col("_did_").as(docIdCol), col("tag"), col("entityIndex"),
        col("_pos_").as("from"),
        (col("_pos_") + size(col("_legs_"))).as("to"))
  }
}
