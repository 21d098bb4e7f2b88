package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-12 hardening wave: the applyTopKDeltaSigned
  * over-retraction fix, the weightedPrioritySample weight-contract
  * raise path, copy-on-write deletes over NULL-predicate rows, the
  * sortedNeighborhoodPairs lexicographic-order contract on numeric
  * keys, the hitsInt measured-degree overflow guard, and the
  * jaccardLinkPrediction scorer with its super-node center cap. */
class Round12Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def messages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("applyTopKDeltaSigned: over-delete never resurrects; runner-up fills") {
    import graft.operators.Temporal
    val state = Seq(("g", 1L, 100L, 1L), ("g", 2L, 90L, 1L),
      ("g", 3L, 80L, 1L)).toDF("grp", "id", "score", "m")
    val view = Seq(("g", 1L, 100L), ("g", 2L, 90L))
      .toDF("grp", "id", "score")
    // delete id=1 (present) AND over-delete id=9 (never inserted)
    val delta = Seq(("g", 1L, 100L, -1L), ("g", 9L, 70L, -1L))
      .toDF("grp", "id", "score", "m")
    val (newState, newView) = Temporal.applyTopKDeltaSigned(
      state, view, delta, "grp", "id", "score", "m", k = 2)
    // the z-set state RETAINS the negative row awaiting its insert...
    val st = newState.select("id", "m").as[(Long, Long)].collect().toMap
    assert(st == Map(2L -> 1L, 3L -> 1L, 9L -> -1L))
    // ...but the view must NOT resurrect it: 1 leaves, 3 fills in, 9 absent
    val v = newView.select("id", "score").as[(Long, Long)].collect().toSet
    assert(v == Set((2L, 90L), (3L, 80L)))
    // the matching late insert cancels the debt: state drops the row and
    // the view still ranks only present rows
    val late = Seq(("g", 9L, 70L, 1L)).toDF("grp", "id", "score", "m")
    val (st2, v2) = Temporal.applyTopKDeltaSigned(
      newState, newView, late, "grp", "id", "score", "m", k = 2)
    assert(!st2.select("id").as[Long].collect().contains(9L))
    assert(v2.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("weightedPrioritySample: zero/NULL/fractional weights fail loudly") {
    import graft.operators.Sampling
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val e = intercept[Exception] {
        Sampling.weightedPrioritySample(df, "id", "g", "w", k = 2).collect()
      }
      messages(e)
    }
    val zero = run(Seq((1L, "g", 1L), (2L, "g", 0L)).toDF("id", "g", "w"))
    assert(zero.exists(_.contains("must be an integer >= 1, got 0")))
    val neg = run(Seq((1L, "g", -3L)).toDF("id", "g", "w"))
    assert(neg.exists(_.contains("got -3")))
    // NULL weight: the message itself must carry the diagnostic (the
    // raise_error arg coalesces — no message-less null-propagated error)
    val nul = run(Seq((1L, "g", Some(2L)), (2L, "g", None))
      .toDF("id", "g", "w"))
    assert(nul.exists(_.contains("must be an integer >= 1, got NULL")))
    // fractional weight: 1.9 is rejected, not silently floored to 1
    val frac = run(Seq((1L, "g", 1.9), (2L, "g", 3.0)).toDF("id", "g", "w"))
    assert(frac.exists(_.contains("got 1.9")))
    // integral doubles are fine and match the long-weight draw exactly
    val gotD = Sampling.weightedPrioritySample(
        Seq((1L, "g", 2.0), (2L, "g", 5.0), (3L, "g", 1.0))
          .toDF("id", "g", "w"), "id", "g", "w", k = 2)
      .select("id", "priority").as[(Long, Long)].collect().toSet
    val want = Seq((1L, 2L), (2L, 5L), (3L, 1L))
      .map { case (id, w) =>
        (id, (graft.functions.TextKernels.mix64(id) >>> 1) / w) }
      .sortBy(x => (x._2, x._1)).take(2).toSet
    assert(gotD == want)
  }

  test("copy-on-write delete: NULL-predicate rows survive the rewrite") {
    import graft.operators.CopyOnWrite
    val dir = graft.sources.Scratch.dir(spark, "cow", "nullpred")
    // k is NULL on every 10th row; pred `k <= 100` is NULL there
    val rows = (1 to 500).map(i =>
      (if (i % 10 == 0) None else Some(i.toLong), i.toLong))
    rows.toDF("k", "v").repartition(4)
      .write.mode("overwrite").parquet(dir)
    val del = CopyOnWrite.deleteWhere(spark, dir, col("k") <= 100, epoch = 1L)
      .as[(Long, Long, Long)].collect().head
    // pred IS TRUE on exactly the 90 non-null k in 1..100
    assert(del._3 == 90L)
    val after = spark.read.parquet(dir)
    assert(after.where(col("k").isNull).count() == 50L)
    assert(after.where(col("k") <= 100).count() == 0L)
    assert(after.count() == 410L)
  }

  test("sortedNeighborhoodPairs: numeric keys rank by their string cast") {
    import graft.operators.Linkage
    // ids 1..30 keyed by the number itself: lexicographically '10' < '2',
    // and the shard prefix ('1','2',...) must agree with in-shard order —
    // the raw-numeric ordering would scramble global ranks silently
    val rows = (1L to 30L).map(i => (i, i))
    val df = rows.toDF("id", "key").repartition(5)
    val w = 4
    val got = Linkage.sortedNeighborhoodPairs(df, "id", "key", w)
      .select("a_id", "b_id", "rank_dist")
      .as[(Long, Long, Long)].collect().toSet
    val ranked = rows.sortBy { case (id, k) => (k.toString, id) }.zipWithIndex
    val want = (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb - ra > 0 && rb - ra < w
    } yield (a._1, b._1, (rb - ra).toLong)).toSet
    assert(got == want)
    assert(got.size == want.size)
  }

  test("hitsInt: refuses iteration counts that can overflow Long") {
    import graft.operators.Graph
    // star: 1 -> 2..201 gives max out-degree 200, max in-degree 1;
    // 9 * log2(200) = 68.8 >= 63 must be refused, 2 rounds are fine
    val e = (2L to 201L).map(d => (1L, d)).toDF("s", "d")
    val err = intercept[IllegalArgumentException] {
      Graph.hitsInt(e, "s", "d", iterations = 9)
    }
    assert(err.getMessage.contains("can overflow 64-bit scores"))
    assert(Graph.hitsInt(e, "s", "d", iterations = 2).count() == 201L)
  }

  test("jaccardLinkPrediction: hand-computed scores, edges never proposed") {
    import graft.operators.Graph
    // triangle 1-2-3 plus tail 3-4-5 (undirected via both-direction union)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = Graph.jaccardLinkPrediction(e, "s", "d", k = 5)
      .select("node_id", "candidate_id", "common", "jaccard_milli", "rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    // N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3,5} N(5)={4}
    val want = Set(
      (1L, 4L, 1L, 333L, 1), (4L, 1L, 1L, 333L, 1),
      (2L, 4L, 1L, 333L, 1), (4L, 2L, 1L, 333L, 2), // tie -> id order
      (3L, 5L, 1L, 333L, 1), (5L, 3L, 1L, 333L, 1))
    assert(got == want)
  }

  test("decimalQuantileSketch: 1% lower-bound accuracy, merge == whole, negatives raise") {
    import graft.operators.Sketch
    val rnd = new scala.util.Random(23)
    // heavy-tailed positives spanning 5 decades, plus edge values
    val vals = Seq(0L, 1L, 9L, 10L, 99L, 100L) ++
      Seq.fill(2000)(math.abs(rnd.nextLong()) % 100000 + 1)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val sk = Sketch.decimalQuantileSketch(df.select("v"), "v", sigDigits = 3)
    val qs = Seq(10L, 250L, 500L, 750L, 900L, 990L)
    val got = Sketch.sketchQuantiles(sk, qs)
      .select("q_milli", "n", "rank", "est")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val (n, rank, est) = got(q)
      assert(n == vals.length)
      assert(rank == math.max(1L, (q * n + 999) / 1000))
      val truth = sorted((rank - 1).toInt)
      // est = bucket lower bound: est <= truth < est + bucket width,
      // width/est <= 10^-(sig-1) = 1% once bkey has all 3 digits
      assert(est <= truth, s"q=$q est=$est truth=$truth")
      val width = math.pow(10,
        math.max(0, truth.toString.length - 3)).toLong
      assert(truth < est + width, s"q=$q est=$est truth=$truth w=$width")
    }
    // merge of disjoint shard sketches == sketch of everything
    val (l, r) = df.randomSplit(Array(0.5, 0.5), seed = 7) match {
      case Array(a, b) => (a, b)
    }
    val merged = Sketch.mergeQuantileSketches(Seq(
        Sketch.decimalQuantileSketch(l.select("v"), "v"),
        Sketch.decimalQuantileSketch(r.select("v"), "v")))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == sk.as[(Long, Long, Long)].collect().toSet)
    // negative values fail the job loudly, not silently skew ranks
    val e = intercept[Exception] {
      Sketch.decimalQuantileSketch(
        Seq(3L, -5L).toDF("v"), "v").collect()
    }
    assert(messages(e).exists(_.contains("must be an integer >= 0, got -5")))
    // fractional values are rejected, not silently floored into the
    // wrong bucket
    val ef = intercept[Exception] {
      Sketch.decimalQuantileSketch(
        Seq(3.0, 1.9).toDF("v"), "v").collect()
    }
    assert(messages(ef).exists(_.contains("got 1.9")))
    // the grouped builder carries the same contract
    val eg = intercept[Exception] {
      Sketch.decimalQuantileSketchBy(
        Seq(("g", -1L)).toDF("g", "v"), "g", "v").collect()
    }
    assert(messages(eg).exists(_.contains("must be an integer >= 0, got -1")))
  }

  test("jaccardLinkPrediction: super-node cap skips hub-centered wedges") {
    import graft.operators.Graph
    // hub 100 touches 10..15 (degree 6); leaves have degree 1
    val e = (10L to 15L).map(d => (100L, d)).toDF("s", "d")
    val uncapped = Graph.jaccardLinkPrediction(e, "s", "d", k = 10)
    // every leaf pair shares only the hub: jaccard = 1000*1/(1+1-1)
    assert(uncapped.count() == 30L) // 15 unordered pairs, both directions
    assert(uncapped.select("jaccard_milli").distinct()
      .as[Long].collect().toSeq == Seq(1000L))
    val capped = Graph.jaccardLinkPrediction(e, "s", "d", k = 10,
      maxCenterDegree = 5)
    assert(capped.count() == 0L) // hub excluded as center; leaves have
                                 // a single neighbor -> no wedge at all
  }
}
