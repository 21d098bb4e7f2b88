package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the dd03 degenerate-bucket probe cost (round-18
  * VERDICT task 3): BENCH_r17 showed dd03 at 0.91→1.40 s vs r16 while the
  * solo builder run attributed only ~0.13 s to the probe — this pins
  * which number is real. Arms alternate probe-ON (default
  * `degenerateBucketBound`) / probe-OFF (`<= 0`) within each repeat pass,
  * so multi-second host-interference windows hit both arms equally (the
  * bench-run-hygiene rule: back-to-back repeats do NOT reject this noise;
  * interleaving does). Reported number per arm = min across repeats.
  * Test-scoped harness tooling, like [[ScaleUp]].
  */
object ProbeAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def run(bound: Long): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.minHashLshPairs(
        graft.Tables.documents(spark, dir), "text", "doc_id",
        numHashes = 64, bands = 16, shingleSize = 3, minEstJaccard = 0.5,
        degenerateBucketBound = bound).count()
      val dt = (System.nanoTime() - t0) / 1e9
      clear()
      dt
    }
    // warmup pass (codegen/Hadoop init) — not recorded
    run(0L); run(BoundOn)
    val on = Array.newBuilder[Double]
    val off = Array.newBuilder[Double]
    for (i <- 1 to repeats) {
      // alternate arm order per pass so neither arm always follows warm IO
      if (i % 2 == 1) { on += run(BoundOn); off += run(0L) }
      else { off += run(0L); on += run(BoundOn) }
      println(f"[probe-ab] pass $i done")
    }
    val (vOn, vOff) = (on.result(), off.result())
    println(f"[probe-ab] dir=$dir repeats=$repeats " +
      f"probeOn_min=${vOn.min}%.3f s probeOff_min=${vOff.min}%.3f s " +
      f"delta=${vOn.min - vOff.min}%.3f s " +
      f"on=[${vOn.map(d => f"$d%.2f").mkString(",")}] " +
      f"off=[${vOff.map(d => f"$d%.2f").mkString(",")}]")
    spark.stop()
  }
  private val BoundOn: Long = graft.operators.Guards.DegenerateBucketBound
}
