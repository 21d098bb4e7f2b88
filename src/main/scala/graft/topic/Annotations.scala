package graft.topic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-annotation merge (reference topic/Annotation.scala:86-121):
  * annotations are an append-only event log keyed by (tokens, tag); merge
  * resolves each key to its latest state — latest-wins by timestamp with
  * delete stickiness (a `delete` operation tombstones the key; earlier
  * records never resurrect it).
  *
  * The reference implements this as repartition(key) +
  * sortWithinPartitions + mapPartitions; the relational form below (window
  * top-1 per key) shuffles once on the key and lets Catalyst/AQE size the
  * partitions — same semantics, no manual partition management.
  */
object Annotations {

  /** @param df columns: tokens array<string>, tag string, score double,
    *           timestamp timestamp/long, operation string (null | "delete")
    * @return one row per surviving (tokens, tag): the latest non-deleted
    *         state. Ties on timestamp resolve to delete (stickiness), then
    *         to highest score for determinism. */
  def merge(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("tokens"), col("tag"))
      .orderBy(col("timestamp").desc,
        (col("operation") === "delete").desc, col("score").desc)
    df.withColumn("_rn_", row_number().over(w))
      .where(col("_rn_") === 1)
      .drop("_rn_")
      .where(col("operation").isNull || col("operation") =!= "delete")
  }
}
