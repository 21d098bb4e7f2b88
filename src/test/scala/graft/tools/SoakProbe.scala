package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off soak probe (round-16 VERDICT task 2 evidence): times the
  * LSH near-dup operator at sf1 across bucket granularities, showing the
  * documented scale knob (bits ~ log2(n / targetBucketSize)) restores
  * near-linear cost where the oracle-pinned 4-bit setting is quadratic.
  * Test-scoped harness tooling, like [[ScaleUp]].
  */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    // warm (and the corpus count the auto-sizing lane uses)
    val nRows = emb.count()
    // round 17: the autoBits(n) lane first — the self-sizing path the
    // round-16 probe's manual sweep motivated; near-linear slope at 10x
    // is the done-criterion for verdict task 1
    val auto = graft.operators.Similarity.autoBits(nRows)
    // GRAFT_SOAK_SWEEP=1 re-runs the full round-16 manual sweep; the
    // default probes only the auto-sized lane (the r16 sweep numbers —
    // bits 4/6/8/10 = 385/126/56/13 s at sf1 — are on record)
    val lanes =
      if (sys.env.get("GRAFT_SOAK_SWEEP").contains("1"))
        Seq(auto, 4, 6, 8, 10).distinct
      else Seq(auto)
    for (bits <- lanes) {
      val tag = if (bits == auto) s"bits=$bits(auto)" else s"bits=$bits"
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity.cosineNearDupPairs(
        emb, "vec_id", "embedding", minCosine = 0.45, dim = 64,
        exact = false, bitsPerTable = bits, nTables = 16, seed = 7L,
        portablePlanes = true).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[soak-probe] lsh_neardup $tag pairs=$n time=$dt%.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
