package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-20 optimization specs — the kernel-level rewrites of the
  * SemDeDup lanes must be BIT-IDENTICAL to the expression forms they
  * replace:
  *
  *  - [[graft.functions.DotProduct]] (codegen'd ascending double dot)
  *    vs the `aggregate(zip_with(...))` idiom it replaces — element-wise
  *    IEEE equality on adversarial floats (denormals, huge/tiny mixes,
  *    cancellation), both float and double lanes, null propagation.
  *  - `assignNearestCentroid`'s tight-loop broadcast argmin vs the
  *    n×k relational argmin (crossJoin + min(struct(dist, label))): same
  *    assignment on a fixture engineered with EXACT distance ties (the
  *    tie must go to the lowest label), and the cluster column must
  *    preserve the centroid label's type (int labels stay int — em01's
  *    schema gate).
  */
class Round20Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("dot_product: bit-identical to aggregate(zip_with) on float arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 64).map { i =>
      val d = 1 + rnd.nextInt(8) * 8
      val a = Array.fill(d)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 4)).toFloat)
      val b = Array.fill(d)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 4)).toFloat)
      (i.toLong, a.toSeq, b.toSeq)
    } :+ ((64L, Seq.empty[Float], Seq.empty[Float])) // empty -> 0.0 both forms
    val df = rows.toDF("id", "a", "b")
    val both = df.select(col("id"),
      org.apache.spark.sql.GraftFunctions.dot_product(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    both.foreach { r =>
      val n = r.getDouble(1); val h = r.getDouble(2)
      // bit equality, not tolerance: the accumulation order is the contract
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(h),
        s"id=${r.getLong(0)}: native=$n hof=$h")
    }
    // null array -> null result in both forms
    val nr = Seq((1L, null.asInstanceOf[Seq[Float]], Seq(1f)))
      .toDF("id", "a", "b")
      .select(
        org.apache.spark.sql.GraftFunctions.dot_product(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("dot_product: double lane matches the zip_with idiom bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 32).map { i =>
      val d = 16
      (i.toLong, Array.fill(d)(rnd.nextGaussian()).toSeq,
        Array.fill(d)(rnd.nextGaussian()).toSeq)
    }
    val both = rows.toDF("id", "a", "b").select(
      org.apache.spark.sql.GraftFunctions.dot_product(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("assignNearestCentroid: tight-loop argmin == relational argmin, " +
       "ties to lowest label, int label type preserved") {
    // 2-d grid of vectors around three centroid seeds; vec 99 sits at the
    // EXACT midpoint of centroids 10 and 20 (same integer grid distance
    // by symmetry), so its assignment exercises the tie rule
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f)), (3L, Seq(0.0f, 0.1f)),
      (4L, Seq(1.0f, 1.0f)), (5L, Seq(0.9f, 1.0f)), (6L, Seq(1.0f, 0.9f)),
      (7L, Seq(-1.0f, -1.0f)), (8L, Seq(-1.0f, -0.9f)),
      (99L, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    // int labels (the em01 shape): label -> explicit per-dim sums, n=2
    val cent = Seq(
      (10, 0, 0L, 2L), (10, 1, 0L, 2L),        // mean (0, 0)
      (20, 0, 2000L, 2L), (20, 1, 2000L, 2L),  // mean (1000, 1000) = (1.0, 1.0)·scale
      (30, 0, -2000L, 2L), (30, 1, -2000L, 2L) // mean (-1.0, -1.0)
    ).toDF("label", "pos", "s", "n")
    val got = Similarity.assignNearestCentroid(vecs, "vec_id", "embedding", cent)
    // schema gate: int labels must stay int
    assert(got.schema("cluster").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // reference: the relational n×k argmin this round's loop replaced
    val centAgg = cent.groupBy(col("label").as("c_label"), col("n"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x("s")).as("cs"))
    val q = transform(col("embedding"),
      e => floor(e.cast("double") * 1000))
    val dist = aggregate(
      zip_with(col("_q_"), col("cs"),
        (qd, sd) => (qd - sd / col("n")) * (qd - sd / col("n"))),
      lit(0.0), (acc, x) => acc + x)
    val ref = vecs.select(col("vec_id").as("_id_"), q.as("_q_"))
      .crossJoin(broadcast(centAgg))
      .withColumn("_dist_", dist)
      .groupBy(col("_id_"))
      .agg(min(struct(col("_dist_"), col("c_label"))).as("_best_"))
      .select(col("_id_"), col("_best_").getField("c_label").as("cluster"))
    val g = got.orderBy("_id_").as[(Long, Int)].collect().toSeq
    val r = ref.orderBy("_id_").as[(Long, Int)].collect().toSeq
    assert(g == r, s"loop argmin diverged from relational argmin:\n$g\n$r")
    // the engineered tie goes to the LOWEST label
    assert(g.find(_._1 == 99L).get._2 == 10)
  }

  test("pairAggPartitions: slot count at bench volumes, grows one " +
       "partition per 64MB of pairs, capped at 32x slots") {
    val slots = spark.sparkContext.defaultParallelism
    val f = graft.operators.Analytics.pairAggPartitions(spark, _: Long)
    // bench scale: a few million pairs stay at the slot count -> the
    // callers keep the stock groupBy plan
    assert(f(0L) == slots)
    assert(f(2_400_000L) == slots)
    // sf10-soak scale: 240M pairs x 24B ~ 5.8GB -> ~87 partitions
    val sf10 = f(240_000_000L)
    assert(sf10 == math.max(slots,
      240_000_000L / ((64L << 20) / 24L) + 1))
    // runaway volumes cap at 32x slots (and never overflow)
    assert(f(Long.MaxValue) == 32 * slots)
  }

  test("simHashPairs hot-bucket grid: output identical to brute force " +
       "when a bucket exceeds the grid threshold") {
    // 1200 identical docs -> one signature, every block bucket holds
    // 1200 rows (> the 1024 grid threshold, g = 2), plus 40 distinct
    // docs that land in cold buckets — exercises the mixed hot/cold path
    val docs = ((1L to 1200L).map(i => (i, "alpha beta gamma delta")) ++
      (1301L to 1340L).map(i => (i, s"tok${i} u${i * 7} v${i % 13} w")))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.simHashPairs(docs, "text", "doc_id",
        maxHamming = 3, degenerateBucketBound = 0)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSeq
    // independent reference: all-pairs hamming over the signatures
    val sigs = graft.operators.Dedup.withSimhash(docs, "text", "_sh_")
      .select("doc_id", "_sh_").as[(Long, Long)].collect().toMap
    val ids = sigs.keys.toSeq.sorted
    val want = for {
      i <- ids; j <- ids if i < j
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j)) if h <= 3
    } yield (i, j, h)
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    assert(got == want.sortBy(p => (p._1, p._2)))
  }

  test("adaptiveStateParts: floor at bench scale, grows with the zone, " +
       "capped at the slot count") {
    val dir = java.nio.file.Files.createTempDirectory("r20_stateparts")
    def put(name: String, mb: Int): Unit = {
      val f = dir.resolve(name).toFile
      val out = new java.io.FileOutputStream(f)
      out.write(new Array[Byte](mb << 20)); out.close()
    }
    val slots = spark.sparkContext.defaultParallelism
    // empty / tiny zone -> exactly the old fixed floor (bench-comparable)
    assert(graft.streaming.Streams.adaptiveStateParts(
      spark, dir.toString, floor = 8) == math.min(slots, 8))
    put("part-0", 1)
    assert(graft.streaming.Streams.adaptiveStateParts(
      spark, dir.toString, floor = 8) == math.min(slots, 8))
    // 67 MB zone (the sf10 shape) -> ceil(67/2) = 34, capped at slots
    put("part-1", 66)
    assert(graft.streaming.Streams.adaptiveStateParts(
      spark, dir.toString, floor = 8) == math.min(slots, 34))
    // missing path -> floor, no throw
    assert(graft.streaming.Streams.adaptiveStateParts(
      spark, dir.resolve("nope").toString, floor = 8) == math.min(slots, 8))
    dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
  }
}
