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
}
