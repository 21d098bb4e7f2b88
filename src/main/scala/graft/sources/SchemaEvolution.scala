package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution read — the lakehouse reality that batches written
  * months apart disagree on columns: later batches add columns (old rows
  * must read NULL) and rename them (both spellings must land in one
  * logical column). Parquet's own `mergeSchema` handles the ADD case by
  * footer-merging; the RENAME case it cannot know about, so the mapping
  * is declared by the caller and compiled into per-column `coalesce` —
  * exactly the "rename = add + backfill view" trick Iceberg's column-id
  * mapping automates.
  *
  * Plan cost: `mergeSchema` reads every file FOOTER up front (driver
  * side, metadata-scale); the coalesce is a row-local projection. At
  * 100 TB pin the merged schema once (a table registry / the newest
  * batch's schema) instead of re-merging per read — `readMerged` takes
  * the directory because the demo IS the discovery path. */
object SchemaEvolution {

  /** Read a directory of parquet batches with heterogeneous schemas:
    * union-by-footer (`mergeSchema`), then fold each `old -> new` rename
    * into one logical column (`coalesce(new, old)` when both spellings
    * exist — a batch never carries both, so no precedence ambiguity).
    * Columns absent from a batch read NULL, parquet's missing-column
    * contract. */
  def readMerged(spark: SparkSession, dir: String,
                 renames: Map[String, String] = Map.empty): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    renames.foldLeft(df) { case (acc, (oldName, newName)) =>
      if (!acc.columns.contains(oldName)) acc
      else if (!acc.columns.contains(newName))
        acc.withColumnRenamed(oldName, newName)
      else acc.withColumn(newName, coalesce(col(newName), col(oldName)))
        .drop(oldName)
    }
  }
}
