package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Model, Plan, Step}

class PipelineModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("model: steps fold over the flow; named outputs feed later steps") {
    val src = Seq(1, 2, 3, 4).toDF("x")
    val result = Model("proj", "m1")
      .step("double", df => df.withColumn("x2", col("x") * 2))
      .step(Step("stats",
        (df, _) => df.agg(sum("x2").as("total")),
        outputs = Seq("stats")))
      .step(Step("final",
        (df, named) => df.crossJoin(named("stats").withColumnRenamed("total", "t")),
        input = Some("stats")))
      .run(src)
    assert(result.named.contains("stats"))
    assert(result.df.columns.contains("t"))
    assert(result.log.map(_._1) == Seq("double", "stats", "final"))
  }

  test("model: select/drop/rename shaping applies post-op") {
    val src = Seq((1, "a")).toDF("x", "y")
    val out = Model("proj", "m2")
      .step(Step("shape", (df, _) => df.withColumn("z", lit(9)),
        drop = Seq("y"), rename = Map("z" -> "zz")))
      .run(src).df
    assert(out.columns.toSeq == Seq("x", "zz"))
  }

  test("model: snapshot memoizes a step and reuses it on re-run") {
    val base = Files.createTempDirectory("graft_snap").toString
    val src = Seq(1, 2, 3).toDF("x")
    var evals = 0
    def mk = Model("proj", "m3", snapshotBase = Some(base))
      .step(Step("expensive", (df, _) => { evals += 1; df.withColumn("y", col("x") + 1) },
        snapshot = true))
    val r1 = mk.run(src)
    assert(evals == 1 && r1.df.count() == 3)
    val r2 = mk.run(src) // snapshot hit: op must NOT re-evaluate
    assert(evals == 1 && r2.df.count() == 3)
    val r3 = mk.run(src, reuseSnapshots = false)
    assert(evals == 2 && r3.df.count() == 3)
  }

  test("model: stopAfter truncates the step list") {
    val src = Seq(1).toDF("x")
    val r = Model("p", "m4")
      .step("s1", df => df.withColumn("a", lit(1)))
      .step("s2", df => df.withColumn("b", lit(2)))
      .run(src, stopAfter = Some("s1"))
    assert(r.df.columns.toSeq == Seq("x", "a"))
  }

  test("plan: set/switch/merge build the variant cross-product") {
    val p = Plan().set("s1.k", "v")
      .switch("s2.mode", Seq("a", "b"))
      .switch("s3.n", Seq("1", "2", "3"))
    assert(p.size == 6)
    assert(p.variants.forall(_("s1.k") == "v"))
    val merged = p.merge(Plan().set("solo", "x"))
    assert(merged.size == 7)
  }
}
