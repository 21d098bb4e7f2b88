package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 soak-data generator (round-16 VERDICT task 2): scales the driver's
  * sf0.1 testdata 10x into `/tmp/graft_sf1` with the SAME schemas, so the
  * scale-critical operator tier can be soaked one decade above the bench
  * scale. Test-scoped on purpose — it is harness tooling, not part of the
  * library (the r14 lesson: no scratch mains in src/main).
  *
  * Scaling rules (all seeded + deterministic):
  *  - TPC-H tables: 10 key-shifted copies — every key column shifts by
  *    `copy * (max_key + 1)` consistently across tables, so FK joins hold
  *    and each copy is key-disjoint; key-derived name columns are
  *    regenerated from the shifted key (uniqueness preserved); all other
  *    attribute distributions are carried over exactly.
  *  - documents: copy 0 is the original; copies 1-9 perturb ~30% of each
  *    doc's tokens (seeded by (doc_id', position)) from the corpus vocab —
  *    far below near-dup thresholds, so cross-copy duplicate structure
  *    does not explode the LSH/minhash candidate joins quadratically and
  *    throughput scaling stays comparable to linear-in-data.
  *  - embeddings: copy 0 original; copies 1-9 fresh unit-normalized
  *    seeded gaussian vectors (NOT perturbed copies — a small-noise copy
  *    would plant 10-cliques of cosine~0.99 neighbors and turn the
  *    threshold ANN queries quadratic).
  *  - events: ids/users shift per copy, timestamps keep the same 30-day
  *    window (same month, 10x the traffic — sessions per user unchanged).
  *  - region/nation: fixed dimensions, copied as-is.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }

    // fixed dims
    write(read("region"), "region")
    write(read("nation"), "nation")

    val copyDf = (0 until copies).toDF("_copy_")
    def shifted(t: String, keyShifts: Seq[(String, Long)],
                regen: DataFrame => DataFrame = identity): DataFrame = {
      val base = read(t).crossJoin(broadcast(copyDf))
      val s = keyShifts.foldLeft(base) { case (df, (k, span)) =>
        df.withColumn(k, col(k) + col("_copy_").cast("long") * span)
      }
      regen(s).drop("_copy_")
    }
    // spans computed from the DATA (max key + 1), never hardcoded: a
    // testdata vintage change would otherwise silently overlap copy key
    // ranges and break the FK disjointness the whole design rests on
    def span(t: String, key: String): Long =
      read(t).agg(max(col(key))).as[Long].head() + 1
    val (nCust, nSupp, nPart, nOrd) =
      (span("customer", "c_custkey"), span("supplier", "s_suppkey"),
        span("part", "p_partkey"), span("orders", "o_orderkey"))

    write(shifted("customer", Seq("c_custkey" -> nCust),
      _.withColumn("c_name",
        format_string("Customer#%09d", col("c_custkey")))), "customer")
    write(shifted("supplier", Seq("s_suppkey" -> nSupp),
      _.withColumn("s_name",
        format_string("Supplier#%09d", col("s_suppkey")))), "supplier")
    // p_name is drawn from a fixed word-pair pool (already ~8x duplicated
    // at sf0.1), so replication continues the generator's own duplication
    write(shifted("part", Seq("p_partkey" -> nPart)), "part")
    write(shifted("orders",
      Seq("o_orderkey" -> nOrd, "o_custkey" -> nCust)), "orders")
    write(shifted("lineitem", Seq("l_orderkey" -> nOrd,
      "l_partkey" -> nPart, "l_suppkey" -> nSupp)), "lineitem")

    // events: same time window, 10x users and events
    val nEvt = span("events", "event_id")
    val maxUser = read("events").agg(max("user_id")).as[Long].head() + 1
    write(shifted("events",
      Seq("event_id" -> nEvt, "user_id" -> maxUser)), "events")

    // documents: token-level perturbation for copies > 0
    val nDoc = span("documents", "doc_id")
    val vocab = read("documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().as[String].collect().sorted
    val bcVocab = spark.sparkContext.broadcast(vocab)
    val perturb = udf { (text: String, docId: Long, copy: Int) =>
      if (copy == 0) text
      else {
        val v = bcVocab.value
        text.split(" ").zipWithIndex.map { case (tok, i) =>
          // ~30% of positions re-drawn from the vocab, seeded by
          // (doc id, position): deterministic, layout-independent
          val h = scala.util.hashing.MurmurHash3.productHash((docId, i))
          if (math.floorMod(h, 10) < 3)
            v(math.floorMod(h >> 4, v.length))
          else tok
        }.mkString(" ")
      }
    }
    val docs = read("documents").crossJoin(broadcast(copyDf))
      .withColumn("doc_id", col("doc_id") + col("_copy_").cast("long") * nDoc)
      .withColumn("text", perturb(col("text"), col("doc_id"), col("_copy_")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_copy_")
    write(docs, "documents")

    // embeddings: fresh unit gaussians for copies > 0
    val nVec = span("embeddings", "vec_id")
    val dim = read("embeddings")
      .select(size(col("embedding"))).as[Int].head()
    val labels = read("embeddings").select("label").distinct()
      .as[Int].collect().sorted
    val bcLabels = spark.sparkContext.broadcast(labels)
    val freshVec = udf { (vecId: Long) =>
      val rnd = new scala.util.Random(vecId * 2654435761L + 17)
      val raw = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      raw.map(_ / n)
    }
    val freshLabel = udf { (vecId: Long) =>
      val ls = bcLabels.value
      ls(math.floorMod(scala.util.hashing.MurmurHash3.productHash(
        (vecId, 99)), ls.length))
    }
    val emb = read("embeddings").crossJoin(broadcast(copyDf))
      .withColumn("vec_id", col("vec_id") + col("_copy_").cast("long") * nVec)
      .withColumn("embedding",
        when(col("_copy_") === 0, col("embedding"))
          .otherwise(freshVec(col("vec_id"))))
      .withColumn("label",
        when(col("_copy_") === 0, col("label"))
          .otherwise(freshLabel(col("vec_id"))))
      .drop("_copy_")
    write(emb, "embeddings")

    spark.stop()
    println(s"[scaleup] done -> $dst")
  }
}
