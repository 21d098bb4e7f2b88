package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: per-phase wall times of gr05 at a given SF. */
object Gr05Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    SparkEntry.queries("gr05_kcore")(spark, "/root/testdata/sf0.001").collect()
    val t0 = System.nanoTime()
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    val out = graft.operators.Graph.kCore(pairs, "src", "dst", k = 80L)
      .orderBy("node_id")
    val n = out.collect().length
    println(f"[probe] total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    spark.stop()
  }
}
