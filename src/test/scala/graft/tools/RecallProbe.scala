package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off recall meter (round-19 VERDICT task 3 evidence): measures the
  * MinHash lane's recall against EXACT n-gram Jaccard truth on the dd05
  * fixture corpus — the number `Dedup.ngramJaccardPairs`' candidate-volume
  * raise cites when it tells callers "use minHashLshPairs at this
  * density". Both lanes run the same word 3-gram shingles and the same
  * 0.8 threshold as the gated dd05/dd03 queries. Test-scoped harness
  * tooling, like [[SoakProbe]] / [[ScaleUp]].
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val n = docs.count()
    val t0 = System.nanoTime()
    val truth = graft.operators.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", n = 3, minJaccard = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tTruth = (System.nanoTime() - t0) / 1e9
    println(f"[recall-probe] corpus=$dir docs=$n exact_pairs=${truth.size} " +
      f"truth_time=$tTruth%.1f s")
    for (minEst <- Seq(0.8, 0.7)) {
      val t1 = System.nanoTime()
      val approx = graft.operators.Dedup.minHashLshPairs(
        docs, "text", "doc_id", numHashes = 64, bands = 16,
        shingleSize = 3, minEstJaccard = minEst)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t1) / 1e9
      val hit = truth.count(approx.contains)
      val recall = if (truth.isEmpty) 1.0 else hit.toDouble / truth.size
      println(f"[recall-probe] minhash minEstJaccard=$minEst pairs=" +
        f"${approx.size} recall_vs_exact=$recall%.4f ($hit/${truth.size}) " +
        f"time=$dt%.1f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // df-capped gram lane (round-19 stretch): recall-vs-cap table for the
    // COVERAGE note that maxGramDfRatio's scaladoc points at. The lane's
    // output is a SUBSET of the exact lane's with identical scores (only
    // candidate GENERATION is pruned), so recall against `truth` is the
    // whole quality story; precision is 1.0 by construction. The grid
    // spans caps that BIND on this corpus (capDf = ratio × 50k docs from
    // ~200 down to 5; trigram df tops out in the low hundreds at sf1) —
    // a cap above max df prunes nothing and, with the capped lane's
    // full-rare-set prefix, IS the all-grams join, which the candidate
    // guard refuses by design (the last grid point demonstrates it).
    for (ratio <- Seq(0.004, 0.002, 0.001, 0.0005, 0.0002, 0.0001, 0.25)) {
      val vol = graft.operators.Dedup.ngramCandidateVolume(
        docs, "text", "doc_id", n = 3, minJaccard = 0.8,
        maxGramDfRatio = ratio)
      val t1 = System.nanoTime()
      try {
        val capped = graft.operators.Dedup.ngramJaccardPairs(
          docs, "text", "doc_id", n = 3, minJaccard = 0.8,
          maxGramDfRatio = ratio)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t1) / 1e9
        val extra = capped.count(!truth.contains(_))
        val hit = truth.count(capped.contains)
        val recall = if (truth.isEmpty) 1.0 else hit.toDouble / truth.size
        println(f"[recall-probe] dfcap maxGramDfRatio=$ratio pairs=" +
          f"${capped.size} recall_vs_exact=$recall%.4f ($hit/${truth.size}) " +
          f"non_subset=$extra candidate_volume=$vol time=$dt%.1f s")
      } catch { case e: IllegalArgumentException =>
        // disclosed in the table rather than crashing the sweep: this is
        // the guard doing its job on a cap that does not bind
        println(f"[recall-probe] dfcap maxGramDfRatio=$ratio GUARD RAISE " +
          f"candidate_volume=$vol (bound 2^27)")
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
