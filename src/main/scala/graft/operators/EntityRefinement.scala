package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-refinement workflow (reference text/EntityCalculator.scala:16-126
  * + text/WordCategoryScorer.scala:14-133): entities are multi-leg synonym
  * sets carried with a review Trace (iteration, userStatus, score, ...);
  * the scorer proposes new single-token entities per tag by TF-IDF ×
  * tag-affinity, excluding tokens already covered by reviewed entities.
  *
  * The reference collects entities to the driver and cross-joins tag token
  * maps in Scala; here every step is a relational groupBy/window/anti-join
  * (shuffle-native, no driver materialization) — the 100 TB shape.
  */
object EntityRefinement {

  /** Review-trace column bundle (reference text/Trace.scala semantics):
    * iteration the entity was produced in, userStatus
    * (proposed/ok/ignore/other/refine/refined), score, change markers. */
  val traceCols: Seq[String] =
    Seq("iteration", "userStatus", "changed", "score", "changedOn", "stability")

  def proposedTrace(iteration: Int, score: Column): Seq[(String, Column)] = Seq(
    "iteration" -> lit(iteration),
    "userStatus" -> lit("proposed"),
    "changed" -> lit(true),
    "score" -> score,
    "changedOn" -> lit(iteration).cast("long"),
    "stability" -> lit(0))

  /** GROUP reshaping (reference EntityCalculator.groupEntities): flat
    * (tagGroup, tag, entityGroup, entityIndex, synonym, trace...) rows →
    * one row per entity with legs nested:
    * legs = array[ array[ struct(synonym, iteration, userStatus, score) ] ]
    * (outer = legs by entityIndex, inner = alternative synonyms). */
  def groupEntities(entities: DataFrame): DataFrame = {
    entities
      .groupBy("tagGroup", "tag", "entityGroup", "entityIndex")
      .agg(sort_array(collect_list(struct(
        col("synonym"), col("iteration"), col("userStatus"), col("score"))))
        .as("_syns_"))
      .groupBy("tagGroup", "tag", "entityGroup")
      .agg(expr("transform(array_sort(collect_list(struct(entityIndex, _syns_))), x -> x._syns_)")
        .as("legs"))
  }

  /** UNGROUP reshaping (reference ungroupEntities): nested legs back to one
    * row per (entityGroup, entityIndex, synonym). */
  def ungroupEntities(grouped: DataFrame): DataFrame = {
    grouped
      .select(col("tagGroup"), col("tag"), col("entityGroup"),
        posexplode(col("legs")).as(Seq("entityIndex", "_leg_")))
      .select(col("tagGroup"), col("tag"), col("entityGroup"), col("entityIndex"),
        explode(col("_leg_")).as("_syn_"))
      .select(col("tagGroup"), col("tag"), col("entityGroup"), col("entityIndex"),
        col("_syn_.synonym").as("synonym"),
        col("_syn_.iteration").as("iteration"),
        col("_syn_.userStatus").as("userStatus"),
        col("_syn_.score").as("score"))
  }

  /** WordCategoryScorer.fit re-expressed relationally.
    *
    * @param texts    (tagGroup, tag, tokens array<string>)
    * @param entities existing entity rows (tagGroup, tag, entityGroup,
    *                 entityIndex, synonym array<string>, userStatus);
    *                 single-token synonyms with a reviewed status are
    *                 excluded from proposals: statuses ignore/ok/proposed/
    *                 refine/refined exclude the token across the whole
    *                 tagGroup, status `other` excludes it on its own tag
    *                 only (reference WordCategoryScorer.scala:18-34).
    * @param maxPropositions top-N proposals per (tagGroup, tag)
    * @param iteration stamped into the proposal Trace
    * @return entity rows (tagGroup, tag, entityGroup=-1, entityIndex=0,
    *         synonym=[token], iteration, userStatus='proposed', score)
    *
    * Score: tf·idf across the group's tags (idf = ln(#tags / #tags with
    * token)), normalized to a share of the tag's total; a token is proposed
    * only for the tag where it scores highest (the reference's
    * best-on-own-tag cross-check, WordCategoryScorer.scala:95-117). */
  def proposeCategoryTokens(texts: DataFrame, entities: DataFrame,
                            maxPropositions: Int = 10,
                            iteration: Int = 1): DataFrame = {
    val toks = texts.select(col("tagGroup"), col("tag"),
      explode(col("tokens")).as("token"))
    val tf = toks.groupBy("tagGroup", "tag", "token")
      .agg(count(lit(1)).as("tf"))
    val tagCounts = toks.select("tagGroup", "tag").distinct()
      .groupBy("tagGroup").agg(count(lit(1)).as("nTags"))
    val docFreq = toks.select("tagGroup", "tag", "token").distinct()
      .groupBy("tagGroup", "token").agg(count(lit(1)).as("docCount"))
    // reviewed single-token synonyms → exclusions. Applied BEFORE the share
    // normalization: ignored tokens must not influence the per-tag total
    // (the reference filters them out of the token stream up front).
    val reviewed = entities
      .where(size(col("synonym")) === 1)
      .select(col("tagGroup"), col("tag"),
        element_at(col("synonym"), 1).as("token"), col("userStatus"))
    val globalExcl = reviewed
      .where(col("userStatus").isin("ignore", "ok", "proposed", "refine", "refined"))
      .select("tagGroup", "token").distinct()
    val tagExcl = reviewed.where(col("userStatus") === "other")
      .select("tagGroup", "tag", "token").distinct()

    // tfidf is truncated to DECIMAL(20,6) before the per-tag window sum so
    // the normalizer is exact and summation-order-independent (float sums
    // would make cross-tag argmax nondeterministic); the final division
    // runs in double on both engines. Tags whose tfidf total is zero (every
    // token present in every tag) have nothing to propose — dropped, which
    // also guards the ANSI divide-by-zero.
    val scored = tf
      .join(docFreq, Seq("tagGroup", "token"))
      .join(broadcast(tagCounts), Seq("tagGroup"))
      .join(globalExcl, Seq("tagGroup", "token"), "left_anti")
      .join(tagExcl, Seq("tagGroup", "tag", "token"), "left_anti")
      .withColumn("tfidf", (col("tf") * log(col("nTags") / col("docCount")))
        .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
      .withColumn("_tagsum_",
        sum(col("tfidf")).over(Window.partitionBy("tagGroup", "tag")))
      .where(col("_tagsum_") > 0)
      .withColumn("share",
        col("tfidf").cast("double") / col("_tagsum_").cast("double"))

    val bestTag = Window.partitionBy("tagGroup", "token")
      .orderBy(col("share").desc, col("tag"))
    val topN = Window.partitionBy("tagGroup", "tag")
      .orderBy(col("share").desc, col("token"))
    val proposals = scored
      .withColumn("_bt_", row_number().over(bestTag))
      .where(col("_bt_") === 1) // only the tag where the token scores best
      .withColumn("_rk_", row_number().over(topN))
      .where(col("_rk_") <= maxPropositions)

    val traced = proposedTrace(iteration, col("share"))
    traced.foldLeft(
      proposals.select(col("tagGroup"), col("tag"),
        lit(-1).as("entityGroup"), lit(0).as("entityIndex"),
        array(col("token")).as("synonym"), col("share"))
    ) { case (df, (name, c)) => df.withColumn(name, c) }
      .drop("share")
  }

  /** Refine-status proposal (reference workflow: entities the user marked
    * `refine` get their multi-token synonyms split into one candidate per
    * token, stamped `refined`). */
  def refineEntities(entities: DataFrame, iteration: Int): DataFrame = {
    val base = entities.where(col("userStatus") === "refine")
      .select(col("tagGroup"), col("tag"), col("entityGroup"),
        col("entityIndex"), posexplode(col("synonym")).as(Seq("_i_", "token")))
      .select(col("tagGroup"), col("tag"), col("entityGroup"),
        (col("entityIndex") * 1000 + col("_i_")).as("entityIndex"),
        array(col("token")).as("synonym"))
    proposedTrace(iteration, lit(0.0)).foldLeft(base) {
      case (df, (name, c)) => df.withColumn(name, c)
    }.withColumn("userStatus", lit("refined"))
  }
}
