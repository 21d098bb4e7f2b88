package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, FuzzyLookup, Packing, TextAnalysis, Tuning}

/** Specs for the round-15 wave: overflow-safe shard assignment (the
  * `hi - lo` / `id - lo` Long wrap for value domains spanning more than
  * 2^63 — round-14 ADVICE), the new sharded exclusive prefix-min and the
  * global-window re-plans built on it (skyline2d, scoreBuckets,
  * rankSplit), and the lookupArray/lookupMulti reserved-name guards. */
class Round15Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  // ---- overflow-safe sharding -------------------------------------------

  test("runningTotalSharded: ids spanning more than 2^63 (hash-like longs)") {
    // pre-fix, width = (hi - lo) / n + 1 wrapped NEGATIVE for this span
    // and shard assignment collapsed; the prefix sums then disagreed with
    // the single-window definition
    val ids = Seq(Long.MinValue, Long.MinValue + 7, -3L, 0L, 5L,
      Long.MaxValue - 11, Long.MaxValue)
    val vmap = ids.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }.toMap
    val df = vmap.toSeq.toDF("id", "v")
    val got = Packing.runningTotalSharded(df, "id", "v", "cum", numShards = 4)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
    val expect = ids.sorted.map(id =>
      (id, ids.filter(_ <= id).map(vmap).sum))
    assert(got == expect)
  }

  test("packBestFitDecreasing: extreme id span still shards and packs") {
    val df = Seq((Long.MinValue, 30L), (-1L, 30L), (Long.MaxValue, 50L))
      .toDF("id", "w")
    val out = Packing.packBestFitDecreasing(df, "id", "w", capacity = 64L,
        numShards = 2)
      .select("id", "bin_id", "oversized").as[(Long, Long, Boolean)]
      .collect().map { case (id, bin, over) => id -> (bin, over) }.toMap
    assert(out.size == 3 && out.values.forall(!_._2)) // nothing oversized
  }

  test("nullsLast shard never collides with rounded fractional ids") {
    // regression: shardExpr's double->decimal cast ROUNDED (HALF_UP), so
    // an id like 31.6 over span [0,31] with 32 shards landed in shard 32
    // — the reserved NULL shard — and NULL rows interleaved mid-order
    val rows = Seq((1L, Some(0.0)), (2L, Some(15.2)), (3L, Some(31.6)),
      (4L, None), (5L, Some(31.4)), (6L, Some(0.4)))
    val df = rows.toDF("tie", "id").withColumn("v", lit(1L))
    val got = Packing.runningTotalSharded(df, "id", "v", "cum",
        numShards = 32, tieCols = Seq("tie"), nullsLast = true)
      .select("tie", "cum").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("id").asc_nulls_last, col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("cum", sum(col("v")).over(w))
      .select("tie", "cum").as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("rankSplit: a group with an all-NULL metric keeps NULLS FIRST order") {
    val df = Seq(
      ("gNull", Option.empty[Int]), ("gNull", None),
      ("gLow", Some(1)), ("gMid", Some(5)), ("gHigh", Some(9)))
      .toDF("g", "m")
    val got = Tuning.rankSplit(df, Seq("g"), "m", "sum", numFolds = 4)
      .select("g", "fold").distinct().as[(String, Int)].collect().toMap
    val grouped = df.groupBy("g").agg(sum(col("m")).as("_metric_"))
    val expect = grouped.withColumn("fold",
        ntile(4).over(Window.orderBy(col("_metric_"), col("g"))) - 1)
      .select("g", "fold").as[(String, Int)].collect().toMap
    assert(got == expect)
    assert(got("gNull") == 0) // NULL metric sorts first -> fold 0
  }

  // ---- sharded exclusive prefix-min --------------------------------------

  test("runningMinSharded == exclusive global-window prefix-min (randomized)") {
    val rnd = new scala.util.Random(15)
    val rows = Seq.tabulate(200)(i =>
      (rnd.nextLong(), rnd.nextInt(1000).toLong)).distinctBy(_._1)
    val df = rows.toDF("id", "v")
    val got = Packing.runningMinSharded(df, "id", "v", "pm", numShards = 7)
      .select("id", "pm").as[(Long, Option[Long])].collect().toMap
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)
    val expect = df.withColumn("pm", min(col("v")).over(w))
      .select("id", "pm").as[(Long, Option[Long])].collect().toMap
    assert(got == expect)
    assert(expect(rows.map(_._1).min).isEmpty) // first row NULL contract
  }

  test("runningMinSharded keeps a NULL-id row, sorted first (window default)") {
    val df = Seq((Some(1L), 10L), (Some(5L), 3L), (Option.empty[Long], 7L))
      .toDF("id", "v")
    val got = Packing.runningMinSharded(df, "id", "v", "pm", numShards = 4)
    assert(got.count() == 3) // regression: the NULL-id row was dropped
    val m = got.select("v", "pm").as[(Long, Option[Long])].collect().toMap
    assert(m(7L).isEmpty)        // NULL id sorts first: no earlier row
    assert(m(10L).contains(7L))  // id=1 sees the null row's value
    assert(m(3L).contains(7L))   // id=5 sees min(7, 10)... = 7
  }

  test("skyline2d sharded prefix-min: frontier matches NOT EXISTS definition") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(50).toLong,
      rnd.nextInt(50).toLong))
    val df = pts.toDF("k", "x", "y")
    val got = Analytics.skyline2d(df, "x", "y")
      .select("k").as[Long].collect().toSet
    val naive = pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= px && qy <= py && (qx < px || qy < py) }
    }.map(_._1).toSet
    assert(got == naive)
  }

  test("runningTotalSharded nullsLast == ASC NULLS LAST window (randomized, ties)") {
    val rnd = new scala.util.Random(21)
    val rows = Seq.tabulate(300)(i => (i.toLong,
      if (i % 11 == 0) None else Some(rnd.nextInt(40).toLong), 1L))
    val df = rows.toDF("tie", "id", "v")
    val got = Packing.runningTotalSharded(df, "id", "v", "cum",
        numShards = 5, tieCols = Seq("tie"), nullsLast = true)
      .select("tie", "cum").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("id").asc_nulls_last, col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("cum", sum(col("v")).over(w))
      .select("tie", "cum").as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  // ---- scoreBuckets re-plan ----------------------------------------------

  test("scoreBuckets == global ntile(desc score NULLS LAST, id), incl. NULLs") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(97)(i => (i.toLong,
      if (i % 13 == 0) None else Some(rnd.nextInt(10) / 3.0)))
    val df = rows.toDF("id", "s")
    val got = TextAnalysis.scoreBuckets(df, "id", "s", nBuckets = 4)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    val expect = df.withColumn("bucket", ntile(4).over(
        Window.orderBy(col("s").desc_nulls_last, col("id"))))
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(got == expect)
  }

  test("scoreBuckets rejects non-finite scores by name") {
    val err = intercept[Exception] {
      Seq((1L, Some(1.0)), (2L, Some(Double.NaN))).toDF("id", "s")
        .transform(TextAnalysis.scoreBuckets(_, "id", "s", 2)).collect()
    }
    def msg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("")) +
        Option(t.getCause).map(msg).getOrElse("")
    assert(msg(err).contains("non-finite s"))
  }

  test("rankSplit == grouped global-ntile definition") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.tabulate(400)(i => ((i % 37).toLong, rnd.nextInt(100)))
    val df = rows.toDF("g", "m")
    val got = Tuning.rankSplit(df, Seq("g"), "m", "sum", numFolds = 5)
      .select("g", "fold").distinct().as[(Long, Int)].collect().toMap
    val grouped = df.groupBy("g").agg(sum(col("m")).as("_metric_"))
    val expect = grouped.withColumn("fold",
        ntile(5).over(Window.orderBy(col("_metric_"), col("g"))) - 1)
      .select("g", "fold").as[(Long, Int)].collect().toMap
    assert(got == expect)
  }

  // ---- Model run-log JSON sink --------------------------------------------

  test("writeRunLog: hive-partitioned append, one row per run, metrics as columns") {
    import graft.pipeline.Model
    val base = java.nio.file.Files.createTempDirectory("graft_runlog_spec")
      .toString
    val src = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "v")
    val m = Model("projX", "mA", group = "grpG")
      .step("filter", df => df.where(col("k") > 1))
      .step("agg", df => df.groupBy("v").agg(count(lit(1)).as("n")))
    val res = m.run(src)
    m.writeRunLog(base, res, metrics = Map("rows_out" -> 2.0))
    m.writeRunLog(base, res, metrics = Map("rows_out" -> 2.0)) // append #2
    val dir = new java.io.File(
      s"$base/model_group=grpG/project=projX/model=mA")
    assert(dir.isDirectory, s"hive layout missing: $dir")
    val back = spark.read.json(base)
    assert(back.count() == 2) // append semantics: one row per run
    val r = back.select("n_steps", "step_names", "rows_out")
      .as[(Long, String, Double)].head()
    assert(r == ((2L, "filter,agg", 2.0)))
    assert(back.columns.contains("filter_ms") && back.columns.contains("agg_ms"))
    // partition columns come back through the directory names
    assert(back.select("model_group", "project", "model")
      .as[(String, String, String)].head() == (("grpG", "projX", "mA")))
    // collision guard: a metric named like an identity column is loud
    val e = intercept[IllegalArgumentException] {
      m.writeRunLog(base, res, metrics = Map("model" -> 1.0))
    }
    assert(e.getMessage.contains("model"))
  }

  // ---- FuzzyLookup reserved-name guards ----------------------------------

  test("lookupArray rejects left columns that collide with scratch names") {
    val right = Seq(("alpha", 1)).toDF("txt", "rid")
    val bad = Seq((Seq("alpha"), 1L)).toDF("qs", "_laid_")
    val e = intercept[IllegalArgumentException] {
      FuzzyLookup.lookupArray(bad, "qs", right, "txt")
    }
    assert(e.getMessage.contains("_laid_"))
    val bad2 = Seq((Seq("alpha"), "x")).toDF("qs", "qs_res")
    val e2 = intercept[IllegalArgumentException] {
      FuzzyLookup.lookupArray(bad2, "qs", right, "txt")
    }
    assert(e2.getMessage.contains("qs_res"))
  }

  test("lookupMulti rejects a pre-existing `{q}_res` twin") {
    val right = Seq(("alpha", 1)).toDF("txt", "rid")
    val bad = Seq(("alpha", "stale")).toDF("q1", "q1_res")
    val e = intercept[IllegalArgumentException] {
      FuzzyLookup.lookupMulti(bad, Seq("q1"), right, "txt")
    }
    assert(e.getMessage.contains("q1_res"))
  }
}
