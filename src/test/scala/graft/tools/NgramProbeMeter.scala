package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off meter for the round-18 ngramJaccardPairs candidate guard:
  * prints the projected candidate volume (sum over prefix grams of
  * prefixDf^2 — the probe's exact statistic) for the dd05 gate shape at a
  * given data dir, so the bound's dormant/raising margins are measured,
  * not guessed. Test-scoped harness tooling, like [[ProbeAb]].
  */
object NgramProbeMeter {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (n, minJaccard) = (3, 0.8) // the dd05 gate knobs
    val df = graft.Tables.documents(spark, dir)
    val grams = df
      .select(col("doc_id").as("_id_"), split(col("text"), " ").as("_w_"))
      .select(col("_id_"),
        explode(expr(
          s"array_distinct(transform(sequence(1, greatest(size(_w_) - ${n - 1}, 1)), i -> xxhash64(array_join(slice(_w_, i, $n), ' '))))"))
          .as("_gram_"))
    val docs = grams
      .withColumn("_df_", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_gram_")))
      .groupBy("_id_")
      .agg(expr("transform(array_sort(collect_list(struct(_df_, _gram_))), x -> x._gram_)")
        .as("_grams_"))
      .withColumn("_n_", size(col("_grams_")))
      .withColumn("_plen_",
        (col("_n_") - ceil(col("_n_") * minJaccard - 1e-9) + 1).cast("int"))
    val prefixes = docs.select(col("_id_"),
      explode(slice(col("_grams_"), lit(1), col("_plen_"))).as("_gram_"))
    val projected = prefixes.groupBy("_gram_")
      .agg(count(lit(1)).as("_pdf_"))
      .agg(coalesce(sum(col("_pdf_").cast("decimal(38,0)") * col("_pdf_")),
        lit(0).cast("decimal(38,0)")))
      .collect()(0).getDecimal(0)
    println(s"[ngram-probe] dir=$dir projected=$projected bound=${1L << 27}")
    spark.stop()
  }
}
