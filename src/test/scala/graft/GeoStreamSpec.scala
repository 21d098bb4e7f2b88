package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Geo
import graft.sources.Checkpoint
import graft.streaming.Streams

class GeoStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("pointInRing: ray casting on convex and concave rings") {
    // unit square
    val xs = Array(0.0, 1.0, 1.0, 0.0)
    val ys = Array(0.0, 0.0, 1.0, 1.0)
    assert(Geo.pointInRing(0.5, 0.5, xs, ys))
    assert(!Geo.pointInRing(1.5, 0.5, xs, ys))
    // concave L-shape: (0,0)(2,0)(2,1)(1,1)(1,2)(0,2)
    val lx = Array(0.0, 2.0, 2.0, 1.0, 1.0, 0.0)
    val ly = Array(0.0, 0.0, 1.0, 1.0, 2.0, 2.0)
    assert(Geo.pointInRing(0.5, 1.5, lx, ly))   // in the vertical arm
    assert(!Geo.pointInRing(1.5, 1.5, lx, ly))  // in the notch
  }

  test("two-phase point-in-polygon join prunes by bbox then tests exactly") {
    val pts = Seq((1L, 0.5, 1.5), (2L, 1.5, 1.5), (3L, 10.0, 10.0))
      .toDF("pid", "x", "y")
    // the concave L-shape: bbox accepts (1.5,1.5) but ray casting rejects it
    val polys = Geo.withBbox(Seq(
      (100L, Seq(0.0, 0.0, 2.0, 0.0, 2.0, 1.0, 1.0, 1.0, 1.0, 2.0, 0.0, 2.0)))
      .toDF("poly_id", "ring"))
    val out = Geo.pointInPolygonJoin(pts, "x", "y", polys)
      .select("pid").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("checkpoint: roundtrip with parquet-illegal column names") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val df = Seq((1, "a"), (2, "b")).toDF("my col,x", "t=v;{}")
    val back = Checkpoint.checkpoint(df, s"$dir/t1")
    assert(back.columns.toSeq == Seq("my col,x", "t=v;{}"))
    assert(back.count() == 2)
    // reuseExisting skips rewrite
    val again = Checkpoint.checkpoint(df.limit(1), s"$dir/t1", reuseExisting = true)
    assert(again.count() == 2)
  }

  test("streaming: windowed counts over a bounded file stream match batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val data = Seq(
      ("2024-01-01 00:05:00", "a", 1.0), ("2024-01-01 00:06:00", "a", 2.0),
      ("2024-01-01 01:05:00", "b", 3.0))
      .toDF("ts_s", "typ", "v")
      .select(to_timestamp(col("ts_s")).as("ts"), col("typ"), col("v"))
    data.write.mode("overwrite").parquet(s"$dir/in")
    val stream = Streams.fileStream(spark, s"$dir/in", data.schema)
    val agg = Streams.windowedCounts(stream, "ts", "typ", "v",
      windowLen = "1 hour", watermark = "1 hour")
    val out = Streams.runToMemory(agg, s"t_${System.nanoTime()}", "complete")
      .select(col("window.start").cast("string"), col("typ"), col("n"), col("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(
      ("2024-01-01 00:00:00", "a", 2L, 3.0),
      ("2024-01-01 01:00:00", "b", 1L, 3.0)))
  }

  test("streaming dedup: flatMapGroupsWithState keeps first sighting across micro-batches") {
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val decisions = Streams.dedupDecisions(in.toDS())
    val name = s"dd_${System.nanoTime()}"
    spark.catalog.dropTempView(name)
    val q = decisions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // batch 1: two distinct texts + an in-batch duplicate
    in.addData((1L, "hello world"), (2L, "other text"), (3L, "hello world"))
    q.processAllAvailable()
    // batch 2: a CROSS-batch duplicate (state must remember batch 1) + new
    in.addData((4L, "hello world"), (5L, "fresh content"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name)
      .select("docId", "keep", "dupIndex")
      .as[(Long, Boolean, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, true, 0),   // first sighting
      (2L, true, 0),
      (3L, false, 1),  // in-batch duplicate
      (4L, false, 2),  // cross-batch duplicate: state carried over
      (5L, true, 0)))
  }

  test("flattenHierarchy denormalizes ancestor paths") {
    val nodes = Seq(
      (1L, None: Option[Long], "root"),
      (2L, Some(1L), "mid"),
      (3L, Some(2L), "leaf")).toDF("id", "parent", "name")
    val out = Geo.flattenHierarchy(nodes, "id", "parent", "name")
      .where(col("id") === 3).select("full_name").as[String].collect().head
    assert(out == "root > mid > leaf")
  }
}
