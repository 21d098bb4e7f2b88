package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-13 hardening wave: the quantile-sketch election
  * by numeric bucket lower bound (no caller-supplied sigDigits can
  * corrupt it), mixed-sigDigits merge keeping the lower-bound contract,
  * and the two-round-trip integrality gate that catches fractional
  * DECIMALs above 2^53 (where the double compare is blind). */
class Round13Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def messages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("sketchQuantiles: sig=4 sketch elects by numeric bound, not a code") {
    import graft.operators.Sketch
    // Bucket (4, 9999) vs (5, 1000): under the old blen*10^3+bkey code
    // (with the default sigDigits=3 a caller would pass for a sig=4
    // sketch) (5,1000) coded 6000 < 13999 = (4,9999) and won the min_by
    // despite holding LARGER values. The est-ordered walk cannot invert.
    val vals = Seq.fill(10)(9999L) ++ Seq.fill(10)(10000L)
    val sk = Sketch.decimalQuantileSketch(vals.toDF("v"), "v", sigDigits = 4)
    val got = Sketch.sketchQuantiles(sk, Seq(100L, 500L, 1000L))
      .select("q_milli", "rank", "est").as[(Long, Long, Long)]
      .collect().map { case (q, r, e) => q -> (r, e) }.toMap
    assert(got(100L) == (2L, 9999L))   // rank 2 -> still in the 9999 bucket
    assert(got(500L) == (10L, 9999L))
    assert(got(1000L) == (20L, 10000L))
  }

  test("mixed-sigDigits merge keeps the est <= truth contract") {
    import graft.operators.Sketch
    val rnd = new scala.util.Random(13)
    val vals = Seq.fill(2000)(rnd.nextInt(10000000).toLong)
    val sorted = vals.sorted
    val df = vals.zipWithIndex.map { case (v, i) => (i % 2, v) }.toDF("s", "v")
    // shard 0 sketched fine (sig=3), shard 1 coarse (sig=1) — a config
    // drift the sketch table itself cannot reveal; quantiles must stay
    // true lower bounds anyway (error bound degrades to the coarse sig)
    val merged = Sketch.mergeQuantileSketches(Seq(
      Sketch.decimalQuantileSketch(
        df.where(col("s") === 0).select("v"), "v", sigDigits = 3),
      Sketch.decimalQuantileSketch(
        df.where(col("s") === 1).select("v"), "v", sigDigits = 1)))
    val qs = Seq(1L, 100L, 250L, 500L, 750L, 900L, 999L, 1000L)
    val got = Sketch.sketchQuantiles(merged, qs)
      .select("q_milli", "rank", "est").as[(Long, Long, Long)].collect()
    assert(got.length == qs.size)
    got.foreach { case (q, rank, est) =>
      val truth = sorted((rank - 1).toInt)
      assert(est <= truth, s"q=$q est=$est truth=$truth")
    }
  }

  test("simplifyRefParity reproduces the reference char table; default NFD fold diverges as documented") {
    import graft.functions.TextKernels.{simplify, simplifyRefParity}
    // the four documented divergences (FIXTURES.md §12)
    assert(simplifyRefParity("Œuvre") == "euvre")     // œ→e, not oe
    assert(simplify("Œuvre") == "oeuvre")
    assert(simplifyRefParity("Lætitia") == "latitia") // æ→a, not ae
    assert(simplify("Lætitia") == "laetitia")
    assert(simplifyRefParity("Señor") == "seoor")     // ñ→o table quirk
    assert(simplify("Señor") == "senor")
    // article elision + hyphen/apostrophe → space
    assert(simplifyRefParity("L'Hôpital-sous-Bois") == "  hopital sous bois")
    assert(simplify("L'Hôpital-sous-Bois") == "l'hopital-sous-bois")
    // no elision when the l/d is not followed by an apostrophe, or ends
    // the string
    assert(simplifyRefParity("bel") == "bel")
    assert(simplifyRefParity("d'une grande") == "  une grande")
    assert(simplifyRefParity(null) == null)
  }

  test("viterbiInt: integer DP, longest-final-piece ties, unseg quarantine") {
    import graft.operators.UnigramLm
    // exact tie a+bc == ab+c: ascending-j strict improvement keeps the
    // SMALLEST backpointer, i.e. the longer final piece "bc"
    val tied = Map("a" -> -10L, "bc" -> -20L, "ab" -> -20L, "c" -> -10L)
    assert(UnigramLm.viterbiInt("abc", tied, 2).toSeq == Seq("a", "bc"))
    // higher-scoring multi-char piece beats per-char path
    val sc = Map("a" -> -10L, "b" -> -10L, "ab" -> -15L)
    assert(UnigramLm.viterbiInt("abab", sc, 2).toSeq == Seq("ab", "ab"))
    // uncoverable position -> null; segmentStatsInt counts 1 + flags
    assert(UnigramLm.viterbiInt("axb", sc, 2) == null)
    val docs = Seq((1L, "ab axb"), (2L, "abab")).toDF("doc_id", "text")
    val scoresDf = sc.toSeq.toDF("piece", "score")
    val got = UnigramLm.segmentStatsInt(docs, "doc_id", "text", scoresDf)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 1L), (2L, 1L, 2L, 0L)))
  }

  test("seedPieceScores: chars always covered, deterministic top-k cut") {
    import graft.operators.UnigramLm
    val docs = Seq((1L, "aa ab aa b")).toDF("doc_id", "text")
    val scores = UnigramLm.seedPieceScores(docs, "text",
        maxPieceLen = 2, topMulti = 1)
      .as[(String, Long)].collect().toMap
    // chars a,b always in vocab; exactly one multi-char piece survives:
    // "aa" (cnt 2) beats "ab" (cnt 1)
    assert(scores.keySet == Set("a", "b", "aa"))
    // weights: a appears 2x in each "aa" (2 words) + 1 in "ab" = 5;
    // b = 1 ("ab") + 1 ("b") = 2; aa = 2; total = 9
    def s(c: Long) = math.floor(1e6 * math.log(c / 9.0)).toLong
    assert(scores == Map("a" -> s(5), "b" -> s(2), "aa" -> s(2)))
  }

  test("integrality gate catches fractional DECIMALs above 2^53") {
    import graft.operators.{Sampling, Sketch}
    // 2^53 + 0.5: rounds to the same double as its long floor, so the
    // double round-trip alone is blind; the decimal(38,18) round-trip
    // must catch it and fail loudly with the value in the message.
    val frac = BigDecimal("9007199254740992.5")
    val whole = BigDecimal("9007199254740993")
    val eSk = intercept[Exception] {
      Sketch.decimalQuantileSketch(Seq(frac).toDF("v"), "v").collect()
    }
    assert(messages(eSk).exists(_.contains("got 9007199254740992.5")))
    val eW = intercept[Exception] {
      Sampling.weightedPrioritySample(
        Seq((1L, "g", frac)).toDF("id", "g", "w"), "id", "g", "w", k = 1)
        .collect()
    }
    assert(messages(eW).exists(_.contains("got 9007199254740992.5")))
    // integral wide decimals still pass both round-trips and bucket by
    // their exact digits
    val ok = Sketch.decimalQuantileSketch(Seq(whole).toDF("v"), "v")
      .as[(Long, Long, Long)].collect().toSeq
    assert(ok == Seq((16L, 900L, 1L)))
    val okW = Sampling.weightedPrioritySample(
        Seq((1L, "g", whole)).toDF("id", "g", "w"), "id", "g", "w", k = 1)
      .select("id").as[Long].collect().toSeq
    assert(okW == Seq(1L))
  }
}
