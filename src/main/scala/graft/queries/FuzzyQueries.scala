package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.FuzzyLookup
import graft.operators.FuzzyLookup.Options

/** Driver-visible demo queries for the fuzzy lookup join (no DuckDB
  * equivalent ⇒ rows-only check; semantic parity is asserted by
  * FuzzyLookupSpec against the reference's own fixtures). */
object FuzzyQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Standard strategy: noisy part descriptions (brand + type) resolved
    // against the part catalog.
    "fz01_fuzzy_part_lookup" -> ((s, d) => {
      val part = Tables.part(s, d)
      val catalog = part.select(
        col("p_partkey"),
        concat_ws(" ", col("p_brand"), col("p_type"), col("p_name")).as("part_text"))
      val needles = part.select(
        concat_ws(" ", col("p_brand"), col("p_type")).as("needle")).distinct()
      FuzzyLookup.lookup(needles, "needle", catalog, "part_text",
        Options(maxDfRatio = 0.5))
        .where(col("part_text").isNotNull)
        .select("needle", "p_partkey", "part_text", "_score_")
        .orderBy("needle", "p_partkey")
    }),

    // Ngram strategy: locate short "titles" as subspans inside full document
    // texts (the reference's NgramStrategy use case).
    "fz02_fuzzy_subspan_titles" -> ((s, d) => {
      val docs = Tables.documents(s, d).where(col("doc_id") % 10 === 0)
      val titles = docs.where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("title_id"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("title"))
      FuzzyLookup.lookup(docs.select("doc_id", "text"), "text", titles, "title",
        Options(strategy = "ngram", nNgrams = 3, minScore = 0.5))
        .where(col("title").isNotNull)
        .select("doc_id", "title_id", "title", "_score_", "_startIndex_", "_endIndex_")
        .orderBy("doc_id")
    })
  )
}
