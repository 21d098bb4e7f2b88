package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Graph, Packing, Tuning}

/** Specs for the round-16 ADVICE wave: the sharded-prefix numeric-id
  * contract (string/uuid and numeric-string ids now rejected by name
  * instead of silently mis-accumulating), the all-NULL-id fallback
  * honoring groupCols, rankSplit's non-finite metric guard, keepMinBy's
  * NULL-ordering-key guard, and jaccardLinkPrediction's restored
  * unlimited default center degree. */
class Round16Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  // ---- sharded prefix sums: numeric-id contract -------------------------

  test("runningTotalSharded rejects a non-numeric idCol by name") {
    val df = Seq(("u-1", 1L), ("u-2", 2L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Packing.runningTotalSharded(df, "id", "v", "cum")
    }
    assert(e.getMessage.contains("runningTotalSharded"))
    assert(e.getMessage.contains("must be numeric"))
  }

  test("runningTotalSharded rejects numeric-STRING ids (lexicographic trap)") {
    // "10" < "9" lexicographically but 10 > 9 numerically: pre-fix this
    // sharded by the numeric cast while ordering within shards as strings
    val df = Seq(("9", 1L), ("10", 2L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Packing.runningTotalSharded(df, "id", "v", "cum")
    }
    assert(e.getMessage.contains("must be numeric"))
  }

  test("runningMinSharded rejects a non-numeric idCol by name") {
    val df = Seq(("a", 1L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Packing.runningMinSharded(df, "id", "v", "pm")
    }
    assert(e.getMessage.contains("runningMinSharded"))
  }

  test("runningTotalSharded all-NULL-id fallback honors groupCols") {
    // every id NULL with nullsFirst: the bounds probe nulls out and the
    // fallback window runs — pre-fix it was GLOBAL, accumulating _cum_
    // across groups
    val df = Seq(
      (Option.empty[Long], "g1", 10L, 1),
      (Option.empty[Long], "g1", 20L, 2),
      (Option.empty[Long], "g2", 5L, 3),
      (Option.empty[Long], "g2", 7L, 4)
    ).toDF("id", "g", "v", "tie")
    val got = Packing.runningTotalSharded(df, "id", "v", "cum",
        groupCols = Seq("g"), tieCols = Seq("tie"), nullsFirst = true)
      .orderBy("g", "tie").select("g", "tie", "cum")
      .as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(("g1", 1, 10L), ("g1", 2, 30L),
      ("g2", 3, 5L), ("g2", 4, 12L)))
  }

  // ---- rankSplit: non-finite metric guard --------------------------------

  test("rankSplit raises by name on a NaN metric") {
    val df = Seq(("a", 1.0), ("a", Double.NaN), ("b", 2.0))
      .toDF("grp", "m")
    val e = intercept[Exception] {
      Tuning.rankSplit(df, Seq("grp"), "m", "sum", 2).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m =>
      m.contains("rankSplit") && m.contains("non-finite")), chain(e).mkString("|"))
  }

  test("rankSplit still folds NULL metrics first (contract unchanged)") {
    val df = Seq(("a", Some(1.0)), ("b", Some(5.0)), ("c", Option.empty[Double]))
      .toDF("grp", "m")
    val folds = Tuning.rankSplit(df, Seq("grp"), "m", "sum", 3)
      .select("grp", "fold").as[(String, Int)].collect().toMap
    // NULLS FIRST: c (NULL) -> fold 0, then a, b by ascending metric
    assert(folds == Map("c" -> 0, "a" -> 1, "b" -> 2))
  }

  // ---- keepMinBy: NULL ordering key ---------------------------------------

  test("Dedup.exact raises by name on a NULL id (all-NULL group)") {
    val df = Seq((Option.empty[Long], "same text"),
        (Option.empty[Long], "same text"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] { Dedup.exact(df, "text", "doc_id").collect() }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m =>
      m.contains("keepMinBy") && m.contains("NULL ordering-key")),
      chain(e).mkString("|"))
  }

  test("Dedup.exactByPriority raises by name on a NULL priority (composite key)") {
    // pre-fix: struct(priority, id) is never NULL, so the guard was dead
    // code and a NULL priority sorted FIRST — silently winning the
    // election over the curated priority=0 copy
    val df = Seq((1L, Some(0), "same text"), (2L, Option.empty[Int], "same text"))
      .toDF("doc_id", "prio", "text")
    val e = intercept[Exception] {
      Dedup.exactByPriority(df, "text", "doc_id", "prio").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m =>
      m.contains("keepMinBy") && m.contains("NULL ordering-key")),
      chain(e).mkString("|"))
  }

  test("Dedup.exact unchanged on clean ids") {
    val df = Seq((2L, "t1"), (1L, "t1"), (3L, "t2")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "t1"), (3L, "t2")))
  }

  // ---- jaccardLinkPrediction: default center degree ------------------------

  test("jaccardLinkPrediction default is UNCAPPED (hub-centered pairs kept)") {
    // star: hub 0 connected to 1..6; no other edges. Every candidate pair
    // (i, j) shares ONLY the hub as a common neighbor, so any default
    // center cap below 6 would return zero candidates.
    val edges = (1 to 6).map(i => (0L, i.toLong)).toDF("src", "dst")
    val got = Graph.jaccardLinkPrediction(edges, "src", "dst", k = 2)
    assert(got.count() > 0, "default-arg call must keep hub-centered wedges")
    // and the explicit cap still prunes them
    val capped = Graph.jaccardLinkPrediction(edges, "src", "dst", k = 2,
      maxCenterDegree = 5)
    assert(capped.count() == 0)
  }
}
