package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for dd04's candidate volume at soak scale: per
  * (block, key) occupancy distribution of the simhash pigeonhole join,
  * the Σb² candidate volume it implies, and signature duplication.
  * Test-scoped harness tooling, like [[ScaleUp]]. */
object SimhashBucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val maxHamming = 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val n = docs.count()
    val sigs = graft.operators.Dedup.withSimhash(docs, "text", "_sh_")
      .select("doc_id", "_sh_").persist()
    val nSig = sigs.select("_sh_").distinct().count()
    val nBlocks = maxHamming + 1
    val blockBits = 64 / nBlocks
    val mask = (1L << blockBits) - 1
    val blocked = sigs.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${nBlocks - 1}), b -> shiftrightunsigned(_sh_, b * $blockBits) & ${mask}L)"))
        .as(Seq("_blk_", "_key_")))
    val occ = blocked.groupBy("_blk_", "_key_").agg(count(lit(1)).as("b"))
      .persist()
    val stats = occ.agg(count(lit(1)).as("nKeys"),
      sum(col("b") * col("b")).as("sumB2"), max("b").as("maxB")).head()
    println(s"[simhash-probe] dir=$dir docs=$n distinctSigs=$nSig " +
      s"buckets=${stats.getLong(0)} sumB2=${stats.getLong(1)} " +
      s"maxBucket=${stats.getLong(2)}")
    println("[simhash-probe] top-15 buckets:")
    occ.orderBy(col("b").desc).limit(15).collect().foreach { r =>
      println(f"  blk=${r.getInt(0)} key=${r.getLong(1)}%x b=${r.getLong(2)}")
    }
    // candidate volume by bucket-size decile: where does Σb² live?
    val tiers = occ.select(
      when(col("b") <= 4, "b<=4")
        .when(col("b") <= 64, "b<=64")
        .when(col("b") <= 1024, "b<=1k")
        .when(col("b") <= 16384, "b<=16k")
        .otherwise("b>16k").as("tier"), (col("b") * col("b")).as("b2"))
      .groupBy("tier").agg(sum("b2").as("sumB2"), count(lit(1)).as("nKeys"))
      .orderBy("tier").collect()
    tiers.foreach(r => println(
      s"  tier=${r.getString(0)} sumB2=${r.getLong(1)} keys=${r.getLong(2)}"))
    spark.stop()
  }
}
