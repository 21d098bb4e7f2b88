package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the DISTRIBUTED lane's per-round physical plans for the two
  * connected-components operators (round-20 plan-audit deliverable): the
  * iterative rounds execute eagerly inside the operators, so a query-level
  * `explain` only ever shows the final labels frame — this forces the loop
  * path (`driverThreshold = 0`) on a small synthetic graph with the
  * `spark.graft.explainRounds` hook on, printing round 1's plan for each.
  * Test-scoped harness tooling (the r14 rule: no scratch mains in
  * src/main). Run:
  *   sbt "Test/runMain graft.tools.CcRoundPlans"
  */
object CcRoundPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.explainRounds", "true")
    import spark.implicits._
    // low-diameter components (20 stars + short chains off each hub) so
    // the label-propagation lane converges in a handful of rounds
    val pairs = (20L until 400L).map(i => (i, i % 20)) .toDF("id_a", "id_b")
    println("########## connectedComponents (label-propagation lane, round-1 plan) ##########")
    graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b",
      maxIter = 50, driverThreshold = 0L).count()
    println("########## connectedComponentsStar (star-contraction lane, round-1 plan) ##########")
    graft.operators.Dedup.connectedComponentsStar(pairs, "id_a", "id_b").count()
    spark.stop()
  }
}
