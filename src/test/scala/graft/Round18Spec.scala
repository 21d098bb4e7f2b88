package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph, Materialize}

/** Round-18 hardening specs.
  *
  * Materializer lanes (VERDICT r17 "What's wrong #1"): the iterative
  * operators' per-round materialization is pluggable — `localCheckpoint`
  * locally, reliable `checkpoint()` when a checkpoint dir is set — and the
  * two lanes must be BIT-IDENTICAL on the gated fixtures (the switch moves
  * storage blocks, never data). Test order matters: the no-dir raise must
  * run before any test sets the JVM-global checkpoint dir.
  */
class Round18Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("materializer: reliable lane without a checkpoint dir raises by name") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "another test already set the JVM-global checkpoint dir")
    val s2 = spark.newSession()
    s2.conf.set(Materialize.ConfKey, "reliable")
    import s2.implicits._
    val df = Seq(1L, 2L).toDF("x")
    val e = intercept[IllegalArgumentException](Materialize.round(df))
    assert(e.getMessage.contains("setCheckpointDir"))
    assert(e.getMessage.contains(Materialize.ConfKey))
  }

  test("materializer: unknown lane raises by name") {
    val s2 = spark.newSession()
    s2.conf.set(Materialize.ConfKey, "ram")
    import s2.implicits._
    val df = Seq(1L).toDF("x")
    val e = intercept[IllegalArgumentException](Materialize.round(df))
    assert(e.getMessage.contains("auto|local|reliable"))
  }

  test("materializer: reliable lane is bit-identical on pageRank/CC/kCore " +
    "fixtures and actually writes checkpoints") {
    // Pin the SHARED session to the local lane BEFORE setting the
    // JVM-global checkpoint dir: `auto` + dir would silently flip every
    // other suite onto the reliable lane (same results, pointless disk
    // churn for the rest of the test JVM).
    spark.conf.set(Materialize.ConfKey, "local")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-r18")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val reliable = spark.newSession()
    reliable.conf.set(Materialize.ConfKey, "reliable")

    def inSession(s: SparkSession) = {
      val e = {
        val rnd = new scala.util.Random(18)
        val rows = (1 to 400).map { _ =>
          (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
        }
        s.createDataFrame(rows).toDF("src", "dst")
      }
      val pr = Graph.pageRankInt(e, "src", "dst", iterations = 3)
        .as[(Long, Long)](newLongLongEncoder(s)).collect().toSet
      // driverThreshold = 0 forces the distributed fixpoint (the lane
      // under test); the driver fast path never materializes rounds
      val cc = Dedup.connectedComponents(
        e.where(col("src") =!= col("dst")), "src", "dst",
        driverThreshold = 0L)
        .as[(Long, Long)](newLongLongEncoder(s)).collect().toSet
      val kc = Graph.kCore(e, "src", "dst", k = 3)
        .as[(Long, Long)](newLongLongEncoder(s)).collect().toSet
      (pr, cc, kc)
    }
    val (prL, ccL, kcL) = inSession(spark)
    val (prR, ccR, kcR) = inSession(reliable)
    assert(prR == prL, "pageRankInt differs between materializer lanes")
    assert(ccR == ccL, "connectedComponents differs between lanes")
    assert(kcR == kcL, "kCore differs between lanes")
    assert(prL.nonEmpty && ccL.nonEmpty && kcL.nonEmpty)
    // the reliable lane really checkpointed (files under the dir)
    val wrote = java.nio.file.Files.walk(dir).filter(p =>
      java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, s"reliable lane left no checkpoint files in $dir")
  }

  private def newLongLongEncoder(s: SparkSession) = {
    import s.implicits._
    implicitly[org.apache.spark.sql.Encoder[(Long, Long)]]
  }

  // ---- fz02 candidate-explosion guard (VERDICT r17 "What's wrong #3") ----

  private def hotVocabFixture = {
    import graft.operators.FuzzyLookup
    // 40 DISTINCT queries all sharing token "acme" (the memoized unit is
    // the distinct query set, so the shared token's left df is 40), and
    // 40 catalog rows sharing it too: projected volume >= 40*40 = 1600
    val left = (1 to 40).map(i => s"acme q$i").toDF("q")
    val right = (1 to 40).map(i => s"acme r$i").toDF("text")
    (left, right)
  }

  test("fuzzy candidate guard: raises by name on projected explosion, " +
    "naming maxDfRatio and autoDfRatio") {
    import graft.operators.FuzzyLookup
    val (left, right) = hotVocabFixture
    val e = intercept[IllegalArgumentException] {
      FuzzyLookup.lookup(left, "q", right, "text",
        FuzzyLookup.Options(candidateBound = 1000L))
    }
    assert(e.getMessage.contains("maxDfRatio"))
    assert(e.getMessage.contains("autoDfRatio"))
    assert(e.getMessage.contains("candidateBound"))
  }

  test("fuzzy candidate guard: dormant at the default bound — output " +
    "identical to the guard-disabled lane") {
    import graft.operators.FuzzyLookup
    val (left, right) = hotVocabFixture
    def run(bound: Long) = FuzzyLookup.lookup(left, "q", right, "text",
      FuzzyLookup.Options(candidateBound = bound))
      .select(col("q"), col("text"), col("_score_"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getFloat(2)))
      .toSet
    assert(run(FuzzyLookup.CandidatePairBound) == run(0L))
  }

  test("autoDfRatio: clamps to [1/rightRows, 1] and scales as " +
    "bound/(leftTokens*rightRows) between") {
    import graft.operators.FuzzyLookup.autoDfRatio
    assert(autoDfRatio(100L, 10L) == 1.0) // tiny inputs: nothing to prune
    val mid = autoDfRatio(1000000L, 1000000L, pairBound = 1L << 27)
    assert(math.abs(mid - (1L << 27).toDouble / 1e12) < 1e-12)
    // floor: never below one document's worth of df
    assert(autoDfRatio(1000000L, Long.MaxValue / 4) == 1.0 / 1000000L)
    intercept[IllegalArgumentException](autoDfRatio(0L, 10L))
  }

  test("releaseIndex fence: unreleased-index counter counts only " +
    "releaseIndex=false calls") {
    import graft.operators.FuzzyLookup
    val left = Seq("alpha", "beta").toDF("q")
    val right = Seq("alpha one", "beta two").toDF("text")
    val before = FuzzyLookup.unreleasedIndexCount
    FuzzyLookup.lookup(left, "q", right, "text",
      FuzzyLookup.Options(releaseIndex = true)).count()
    assert(FuzzyLookup.unreleasedIndexCount == before)
    FuzzyLookup.lookup(left, "q", right, "text",
      FuzzyLookup.Options(releaseIndex = false)).count()
    assert(FuzzyLookup.unreleasedIndexCount == before + 1)
  }
}
