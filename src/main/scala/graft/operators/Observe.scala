package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Job-metric observation (reference SURVEY §2 row "Accumulator metrics" —
  * the reference threads Spark accumulators through transformers to count
  * hits/misses; the modern Spark surface is `Dataset.observe`, which
  * attaches aggregate metrics to the SAME job instead of a second action
  * and is exactly-once under task retries, which accumulators are not). */
object Observe {

  /** Attach named metrics to `df`, run `action` (exactly one Spark action),
    * and return (action result, observed metric values by name).
    *
    * Example:
    * {{{
    * val (cnt, m) = Observe.withMetrics(joined, "w2v",
    *   avg(col("hit").cast("double")).as("hit_ratio"))(_.count())
    * }}} */
  def withMetrics[T](df: DataFrame, name: String, metrics: Column*)
                    (action: DataFrame => T): (T, Map[String, Any]) = {
    val obs = Observation(name)
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    val result = action(observed)
    (result, obs.get)
  }
}
