package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Contamination, TextAnalysis}

/** Specs for the round-16 scale-review wave over Analytics/Contamination/
  * TextAnalysis: dirty-data contracts (NULL/NaN no longer corrupt bins,
  * ranks, elections, or EWMA weights — they are excluded or raise by
  * name), overflow-safe decimal arithmetic, and the kaplanMeier /
  * memorizationRisk re-plans proven output-identical to the window forms
  * they replaced. */
class Round16ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def chain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq

  test("histogram excludes NULLs and raises on NaN") {
    val df = Seq(Some(0.5), Some(1.5), None, Some(2.5)).toDF("v")
    val got = Analytics.histogram(df, "v", 0.0, 3.0, 3)
      .orderBy("bin").select("bin", "n").as[(Long, Long)].collect().toSeq
    // pre-fix the NULL landed in bin 0 (greatest skips nulls)
    assert(got == Seq((0L, 1L), (1L, 1L), (2L, 1L)))
    val bad = Seq(0.5, Double.NaN).toDF("v")
    val e = intercept[Exception] {
      Analytics.histogram(bad, "v", 0.0, 3.0, 3).collect()
    }
    assert(chain(e).exists(m => m.contains("histogram") &&
      m.contains("non-finite")), chain(e).mkString("|"))
  }

  test("scoreBucketsApprox raises on NaN and keeps NULLs in the worst bucket") {
    val df = (1 to 30).map(i => (i.toLong, Some(i.toDouble))).toDF("id", "s")
    val withNull = df.union(Seq((99L, Option.empty[Double])).toDF("id", "s"))
    val got = TextAnalysis.scoreBucketsApprox(withNull, "id", "s", nBuckets = 3)
      .where(col("id") === 99).select("bucket").as[Int].head()
    assert(got == 3, "NULL score must land in the worst bucket")
    val bad = df.union(Seq((98L, Some(Double.NaN))).toDF("id", "s"))
    val e = intercept[Exception] {
      TextAnalysis.scoreBucketsApprox(bad, "id", "s", nBuckets = 3).collect()
    }
    assert(chain(e).exists(m => m.contains("scoreBucketsApprox") &&
      m.contains("non-finite")), chain(e).mkString("|"))
  }

  test("groupQuantiles excludes NULL values (bisect-twin parity)") {
    val df = Seq(("g", Some(10L)), ("g", Some(20L)), ("g", Some(30L)),
      ("g", Option.empty[Long]), ("g", Option.empty[Long])).toDF("k", "v")
    val got = Analytics.groupQuantiles(df, "k", "v", Seq(0, 50, 100))
      .orderBy("pct").select("pct", "v").as[(Int, Long)].collect().toSeq
    // pre-fix: NULLs ranked 1..2, p0/p50 returned NULL and p100 shifted
    assert(got == Seq((0, 10L), (50, 20L), (100, 30L)))
  }

  test("madOutliers/winsorize exclude NULLs and raise on fractional values") {
    val df = Seq(("g", 1L, Some(10.0)), ("g", 2L, Some(10.5)))
      .toDF("k", "id", "v")
    val e = intercept[Exception] {
      Analytics.madOutliers(df, "k", "id", "v", 3).collect()
    }
    assert(chain(e).exists(m => m.contains("madOutliers") &&
      m.contains("integral")), chain(e).mkString("|"))
    val withNull = Seq(("g", 1L, Some(100L)), ("g", 2L, Option.empty[Long]),
      ("g", 3L, Some(1L)), ("g", 4L, Some(2L)), ("g", 5L, Some(3L)))
      .toDF("k", "id", "v")
    // median over {1,2,3,100} (NULL excluded) = 2; dev(100)=98, mad=1
    val out = Analytics.madOutliers(withNull, "k", "id", "v", 3)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L))
    val w = Analytics.winsorize(withNull, "k", "id", "v", 0, 100)
    assert(w.count() == 4, "NULL-value rows are excluded from winsorize")
  }

  test("cohensKappa counts only co-rated items and survives big-n decimal") {
    val df = Seq(("g", Some("a"), Some("a")), ("g", Some("a"), Some("b")),
      ("g", Some("b"), Some("b")), ("g", Option.empty[String], Some("a")),
      ("g", Some("a"), Option.empty[String])).toDF("k", "ra", "rb")
    val got = Analytics.cohensKappa(df, "k", "ra", "rb")
      .select("n", "n_agree").as[(Long, Long)].head()
    assert(got == ((3L, 2L)), "NULL-label rows must not count in n")
  }

  test("ewmaSmooth raises by name on a NULL value") {
    val df = Seq(("k", 1L, Some(5L)), ("k", 2L, Option.empty[Long]))
      .toDF("g", "t", "v")
    val e = intercept[Exception] {
      Analytics.ewmaSmooth(df, "g", Seq("t"), "v", "ewma").collect()
    }
    assert(chain(e).exists(m => m.contains("ewmaSmooth") &&
      m.contains("NULL value")), chain(e).mkString("|"))
  }

  test("kaplanMeier re-plan == the single-window program (randomized)") {
    val rnd = new scala.util.Random(83)
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(40).toLong + 1, rnd.nextInt(3) > 0) }
    val df = rows.toDF("dur", "ev")
    val got = Analytics.kaplanMeier(df, "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Option[Long])].collect().toSeq
    // reference: the pre-round-16 window formulation, inline
    val perTime = df
      .select(col("dur").cast("long").as("t"),
        when(col("ev").cast("boolean"), 1L).otherwise(0L).as("_e_"))
      .groupBy("t").agg(count(lit(1)).as("_n_"), sum(col("_e_")).as("n_events"))
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ref = perTime
      .withColumn("n_risk", sum(col("_n_")).over(wDesc))
      .where(col("n_events") > 0)
      .withColumn("_term_",
        when(col("n_events") < col("n_risk"),
          expr("cast(round(ln(cast(n_risk - n_events as double)" +
            " / cast(n_risk as double)) * 1000000) as bigint)")))
      .withColumn("log_surv_micro",
        when(min(when(col("_term_").isNull, 0L).otherwise(1L)).over(wAsc) === 1L,
          sum(col("_term_")).over(wAsc)))
      .select(col("t"), col("n_risk"), col("n_events"), col("log_surv_micro"))
      .orderBy("t").as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == ref)
  }

  test("kaplanMeier extinction still yields NULL log-survival") {
    val df = Seq((5L, true), (5L, true), (3L, true)).toDF("dur", "ev")
    val got = Analytics.kaplanMeier(df, "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got.last._4.isEmpty, "extinguished risk set must carry NULL")
    assert(got.head._4.nonEmpty)
  }

  test("memorizationRisk re-plan == brute-force shared-gram counts (randomized)") {
    val rnd = new scala.util.Random(97)
    val vocab = (1 to 12).map(i => s"w$i")
    val docs = (1 to 60).map { i =>
      (i.toLong, (1 to 3 + rnd.nextInt(12))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val n = 2
    val got = Contamination.memorizationRisk(df, "doc_id", "text", n)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // brute force in Scala
    val gramSets = docs.map { case (id, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      (id, ws.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    val expect = gramSets.map { case (id, gs) =>
      val shared = gs.count(g =>
        gramSets.exists { case (o, og) => o != id && og.contains(g) })
      (id, gs.size.toLong, shared.toLong, shared.toLong * 1000 / gs.size)
    }.sortBy(_._1)
    assert(got == expect)
  }

  test("exactContainsReportAC handles NULL and empty snippets like the twin") {
    val train = Seq((1L, "hello world"), (2L, "nothing here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val sn = Seq(Some("world"), None, Some("")).toDF("snippet")
    def rows(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("doc_id").select("doc_id", "n_hits", "contaminated")
        .as[(Long, Long, Boolean)].collect().toSeq
    val viaJoin = rows(Contamination.exactContainsReport(
      train, "doc_id", "text", sn, "snippet"))
    val viaAC = rows(Contamination.exactContainsReportAC(
      train, "doc_id", "text", sn, "snippet"))
    assert(viaAC == viaJoin, s"AC $viaAC != join $viaJoin")
    // the "" snippet counts for every non-null text (contains semantics)
    assert(viaJoin == Seq((1L, 2L, true), (2L, 1L, true), (3L, 0L, false)))
  }

  test("linearFit yields NULL (not NaN/Inf) for zero-variance groups") {
    val df = Seq(("g", 1.0, 5.0), ("g", 1.0, 7.0)).toDF("k", "x", "y")
    val r = Analytics.linearFit(df, "k", "x", "y")
      .select("slope", "corr_r").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
