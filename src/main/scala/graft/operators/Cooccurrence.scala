package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Co-occurrence-based term proposal (reference
  * text/WordCoocurrenceRefiner.scala:14-130): propose tokens that co-occur
  * with a tag's documents far more often than they co-occur globally —
  * candidates for new entity "legs".
  *
  * The reference reduces driver-side count maps; here both count layers are
  * relational groupBys (map-side partial agg), joined once — shuffle-
  * native and skew-resistant (pair keys dominate, not tags).
  */
object Cooccurrence {

  /** @param docs       (docId, tokens array<string>, tag string)
    * @param minInTag    min occurrences of the token within the tag
    * @param liftFloor   (inTagRate / globalRate) threshold — the "much more
    *                    frequent in tag than globally" test
    * @param topN        proposals kept per tag
    * @return (tag, token, in_tag_docs, global_docs, lift) */
  def proposeTerms(docs: DataFrame, tokensCol: String, tagCol: String,
                   minInTag: Long = 2, liftFloor: Double = 2.0,
                   topN: Int = 10): DataFrame = {
    val docTokens = docs
      .select(col(tagCol).as("_tag_"),
        explode(array_distinct(col(tokensCol))).as("_tok_"))
    // total-doc count stays IN the plan (single-row agg, broadcast cross
    // join) — a driver-side docs.count() would be a second action
    // recomputing the whole input lineage just for one scalar
    val totalDocs = docs.agg(count(lit(1)).cast("double").as("_total_docs_"))
    val tagSizes = docs.groupBy(col(tagCol).as("_tag_"))
      .agg(count(lit(1)).as("_tag_docs_"))
    val global = docTokens.groupBy("_tok_").agg(count(lit(1)).as("global_docs"))
    val inTag = docTokens.groupBy("_tag_", "_tok_")
      .agg(count(lit(1)).as("in_tag_docs"))
      .where(col("in_tag_docs") >= minInTag)
    val scored = inTag
      .join(global, "_tok_")
      .join(tagSizes, "_tag_")
      .crossJoin(broadcast(totalDocs))
      .withColumn("lift",
        (col("in_tag_docs") / col("_tag_docs_")) /
          (col("global_docs") / col("_total_docs_")))
      .where(col("lift") >= liftFloor)
    val w = Window.partitionBy("_tag_")
      .orderBy(col("lift").desc, col("_tok_"))
    scored.withColumn("_rk_", row_number().over(w))
      .where(col("_rk_") <= topN)
      .select(col("_tag_").as("tag"), col("_tok_").as("token"),
        col("in_tag_docs"), col("global_docs"), col("lift"))
  }
}
