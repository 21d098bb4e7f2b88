package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, Skew}
import graft.sources.{Crawler, Shapefile}

class SourceOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- shapefile

  test("shapefile: shp+dbf roundtrip preserves rings, bbox, and attributes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shp").toString
    val tri = Array(0.0, 0.0, 4.0, 0.0, 2.0, 3.0, 0.0, 0.0)
    val hole = Array(1.0, 0.5, 3.0, 0.5, 2.0, 2.0, 1.0, 0.5)
    Shapefile.writeShp(s"$dir/t.shp", Seq(Array(tri, hole), Array(tri.map(_ + 10))))
    Shapefile.writeDbf(s"$dir/t.dbf",
      Seq(Shapefile.DbfField("ID", 'N', 4, 0), Shapefile.DbfField("LBL", 'C', 8, 0)),
      Seq(Seq("7", "alpha"), Seq("8", "beta")))
    val out = Shapefile.read(spark, dir).orderBy("record_no")
      .select("record_no", "n_parts", "n_points", "minX", "maxY", "attrs")
      .collect()
    assert(out.length == 2)
    assert(out(0).getInt(1) == 2 && out(0).getInt(2) == 8) // two rings, 4+4 pts
    assert(out(0).getDouble(3) == 0.0 && out(0).getDouble(4) == 3.0)
    assert(out(0).getMap[String, String](5) == Map("ID" -> "7", "LBL" -> "alpha"))
    assert(out(1).getMap[String, String](5) == Map("ID" -> "8", "LBL" -> "beta"))
    // parsed ring coordinates are bit-identical to what was written
    val ring0 = Shapefile.read(spark, dir).orderBy("record_no")
      .select("ring").as[Array[Double]].head()
    assert(ring0.toSeq == tri.toSeq)
  }

  test("shapefile: point shapes and records without dbf attributes") {
    val shapes = Seq(Shapefile.ShpShape(1, 1, 2.5, 3.5, 2.5, 3.5,
      Array(Array(2.5, 3.5))))
    val dir = java.nio.file.Files.createTempDirectory("graft_shp2").toString
    // reuse writeShp via a degenerate single-point "ring"
    Shapefile.writeShp(s"$dir/p.shp", Seq(Array(Array(2.5, 3.5))))
    val out = Shapefile.read(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Map[String, String]]("attrs").isEmpty) // no .dbf pair
    assert(shapes.head.minX == 2.5) // silence unused warning, sanity anchor
  }

  // --------------------------------------------------------------- crawler

  test("crawler: BFS assigns min depth, visits each url once, honors budget") {
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), // d reachable at 2 twice
      ("d", "a"), // cycle back to the seed
      ("d", "e")).toDF("src", "dst")
    val seeds = Seq("a").toDF("url")
    val out = Crawler.crawl(seeds, Crawler.EdgeFetcher(edges), maxDepth = 10)
      .select("url", "depth").as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2, "e" -> 3))
    // page budget: stop expanding once the fetched count reaches maxPages
    val capped = Crawler.crawl(seeds, Crawler.EdgeFetcher(edges),
      maxDepth = 10, maxPages = 3)
      .select("url", "depth").as[(String, Int)].collect().toMap
    assert(capped == Map("a" -> 0, "b" -> 1, "c" -> 1))
  }

  test("crawler: local file fetcher follows href links on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crawl")
    def page(name: String, body: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
      p.toString
    }
    val p2 = page("two.html", "<p>leaf</p>")
    val p3 = page("three.html", "<p>other leaf</p>")
    val p1 = page("one.html", s"""<a href="$p2">x</a> <a href="$p3">y</a>""")
    val out = Crawler.crawl(Seq(p1).toDF("url"), Crawler.LocalFileFetcher(),
      maxDepth = 3)
      .select("url", "depth", "content").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(out.map(t => (t._1, t._2)).toSet ==
      Set((p1, 0), (p2, 1), (p3, 1)))
    assert(out.find(_._1 == p2).get._3 == "<p>leaf</p>")
  }

  // ------------------------------------------------------------------ skew

  test("robots filter: longest prefix wins, Allow beats Disallow on tie, no-match allows") {
    val urls = Seq(
      (1L, "h1", "/a/b/c"),   // deny /a beaten by allow /a/b (longer)
      (2L, "h1", "/a/x"),     // only deny /a matches
      (3L, "h1", "/z"),       // no rule matches -> allowed
      (4L, "h2", "/a/b/c"),   // other host: deny /a/b vs allow /a/b tie -> allow
      (5L, "h3", "/a")        // host with no rules at all -> allowed
    ).toDF("id", "host", "path")
    val rules = Seq(
      ("h1", false, "/a"), ("h1", true, "/a/b"),
      ("h2", false, "/a/b"), ("h2", true, "/a/b")
    ).toDF("host", "allow", "prefix")
    val out = Crawler.robotsFilter(urls, "id", "host", "path", rules)
      .select("id", "allowed", "matched_prefix")
      .as[(Long, Boolean, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, true, "/a/b"), (2L, false, "/a"),
      (3L, true, ""), (4L, true, "/a/b"), (5L, true, "")))
  }

  test("salted join output equals the plain join; hotCold too") {
    val facts = (1 to 300).map(i => (i % 7, i)).toDF("k", "v")
    val dims = (0 until 7).map(i => (i, s"dim$i")).toDF("k", "name")
    val plain = facts.join(dims, Seq("k")).select("k", "v", "name")
      .as[(Int, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dims, Seq("k"), saltBuckets = 5)
      .select("k", "v", "name").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
    val hc = Skew.hotColdJoin(facts, dims, "k", hotKeys = Seq(0, 1))
      .select("k", "v", "name").as[(Int, Int, String)].collect().toSet
    assert(hc == plain)
  }

  test("salted left join preserves unmatched fact rows exactly once") {
    val facts = Seq((1, "a"), (2, "b"), (99, "orphan")).toDF("k", "v")
    val dims = Seq((1, "d1"), (2, "d2")).toDF("k", "name")
    val out = Skew.saltedJoin(facts, dims, Seq("k"), 4, "left")
      .select("k", "v", "name").as[(Int, String, String)].collect().toSeq
    assert(out.length == 3)
    assert(out.find(_._1 == 99).get._3 == null)
  }

  // ------------------------------------------------------- bucketed layout

  test("bucketed tables join with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bk").toString
    spark.sql("DROP TABLE IF EXISTS bk_l")
    spark.sql("DROP TABLE IF EXISTS bk_r")
    (1 to 100).map(i => (i % 20, i)).toDF("k", "v")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/l").saveAsTable("bk_l")
    (0 until 20).map(i => (i, s"n$i")).toDF("k", "name")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/r").saveAsTable("bk_r")
    val j = spark.table("bk_l").hint("merge")
      .join(spark.table("bk_r").hint("merge"), "k")
    // Execute first: under AQE the top node is AdaptiveSparkPlanExec (a leaf
    // until run), so we must unwrap its final plan or the collect{} below is
    // vacuously empty even when the join does shuffle.
    assert(j.count() == 100)
    val finalPlan = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val shuffles = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
    }
    assert(shuffles.isEmpty, s"expected no exchange, got: $shuffles")
  }

  test("re-mounted external bucketed tables keep the zero-exchange join") {
    // write bucketed, DROP the catalog entries (external: files stay), then
    // re-attach via CREATE TABLE ... CLUSTERED BY ... LOCATION — the
    // write-once/mount-per-job pattern bk01 uses; bucket ids are recovered
    // from the file names, so the merge join must still run shuffle-free
    val dir = java.nio.file.Files.createTempDirectory("graft_bkm").toString
    Seq("bkm_l", "bkm_r").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    (1 to 100).map(i => (i % 20, i)).toDF("k", "v")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/l").saveAsTable("bkm_l")
    (0 until 20).map(i => (i, s"n$i")).toDF("k", "name")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/r").saveAsTable("bkm_r")
    Seq("bkm_l", "bkm_r").foreach(t => spark.sql(s"DROP TABLE $t"))
    spark.sql("CREATE TABLE bkm_l (k INT, v INT) USING parquet " +
      s"CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS LOCATION '$dir/l'")
    spark.sql("CREATE TABLE bkm_r (k INT, name STRING) USING parquet " +
      s"CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS LOCATION '$dir/r'")
    val j = spark.table("bkm_l").hint("merge")
      .join(spark.table("bkm_r").hint("merge"), "k")
    assert(j.count() == 100)
    val finalPlan = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val shuffles = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
    }
    assert(shuffles.isEmpty, s"expected no exchange after re-mount, got: $shuffles")
    Seq("bkm_l", "bkm_r").foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("sharedDir: concurrent builders publish exactly one stage") {
    val kind = s"spec_${System.nanoTime()}"
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val paths = Await.result(Future.sequence((1 to 4).toList.map { _ =>
      Future {
        graft.sources.Scratch.sharedDir(kind, "tag1") { tmp =>
          built.incrementAndGet()
          new java.io.File(tmp).mkdirs()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "data.txt"), "builder".getBytes)
        }
      }
    }), 60.seconds)
    // all callers resolve to the SAME published dir with complete content,
    // no matter how many raced the build
    assert(paths.distinct.size == 1)
    assert(new java.io.File(paths.head, "data.txt").isFile)
    assert(built.get() >= 1)
    // a later call reuses without rebuilding
    val before = built.get()
    val again = graft.sources.Scratch.sharedDir(kind, "tag1")(_ =>
      fail("must not rebuild an existing stage"))
    assert(again == paths.head && built.get() == before)
  }

  test("fingerprint changes when a source file is rewritten in place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp")
    val f = dir.resolve("src.parquet")
    java.nio.file.Files.write(f, "v1-content".getBytes)
    val fp1 = graft.sources.Scratch.fingerprint(f.toString)
    // same content length, later mtime — regeneration must still re-stage
    Thread.sleep(1100) // mtime granularity on some filesystems is 1s
    java.nio.file.Files.write(f, "v2-content".getBytes)
    assert(new java.io.File(f.toString).setLastModified(System.currentTimeMillis()))
    val fp2 = graft.sources.Scratch.fingerprint(f.toString)
    assert(fp1 != fp2, "rewritten source must change the fingerprint")
  }

  // ------------------------------------------------------------------- ivf

  test("embedding text format: write/read round trip, short and malformed lines dropped") {
    val dir = graft.sources.Scratch.dir(spark, "embtxt_spec", "fixture")
    val lex = Seq(("alpha", Seq(1.0, 2.0, 3.0)), ("beta", Seq(-0.5, 0.25, 4.0)))
      .toDF("token", "vector")
    graft.sources.EmbeddingText.write(lex, "token", "vector", dir)
    // append a short line (1 coord) and a malformed one (non-numeric coord):
    // both must be skipped, not crash the scan
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "extra.txt"),
      "short 1.0\nbroken 1.0 x 2.0\n".getBytes)
    val back = graft.sources.EmbeddingText.read(spark, dir)
      .as[(String, Seq[Double])].collect().toMap
    assert(back == Map("alpha" -> Seq(1.0, 2.0, 3.0), "beta" -> Seq(-0.5, 0.25, 4.0)))
  }

  test("IVF ANN: recall >= 0.6 vs brute force top-3 on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where($"vec_id" < 30)
    val truth = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val found = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      k = 3, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.6, s"IVF recall $recall over ${truth.size} true pairs")
  }

  test("tar shards: ustar round trip, sample grouping, corrupt-header quarantine") {
    import graft.sources.TarShards
    val docs = Seq(
      (1L, "hello", Array[Byte](1, 2, 3)),
      (2L, "wörld", null),         // UTF-8 multibyte; null bin -> txt only
      (3L, "x" * 600, Array[Byte](9)))  // body crosses a 512 block boundary
      .toDF("id", "text", "bin")
    val dir = graft.sources.Scratch.dir(spark, "tar_spec", "fixture")
    TarShards.write(docs.repartition(2), "id", "text", dir, binCol = Some("bin"))
    val back = TarShards.read(spark, dir).collect()
    val byName = back.map(r => r.getString(1) -> r.getAs[Array[Byte]](2)).toMap
    assert(byName.keySet == Set("1.txt", "1.bin", "2.txt", "3.txt", "3.bin"))
    assert(new String(byName("2.txt"), "UTF-8") == "wörld")
    assert(byName("1.bin").toSeq == Seq[Byte](1, 2, 3))
    assert(byName("3.txt").length == 600)
    assert(back.map(_.getString(0)).distinct.length == 2, "one shard per partition")
    // grouping contract: a sample's .bin immediately follows its .txt
    val shardWith1 = back.find(_.getString(1) == "1.txt").get.getString(0)
    val entries = back.filter(_.getString(0) == shardWith1).map(_.getString(1)).toSeq
    assert(entries.indexOf("1.bin") == entries.indexOf("1.txt") + 1)
    // checksum-invalid first header -> empty parse (quarantine stops cleanly)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // flip a NAME byte: the stored checksum no longer matches the header sum
    val corrupted = bytes.clone(); corrupted(0) = '#'
    assert(TarShards.parseTar(corrupted).isEmpty)
    assert(TarShards.parseTar(new Array[Byte](1024)).isEmpty) // all-zero = empty archive
  }

  test("IVF portable centroids: kernel matches a naive ±1 reimplementation; recall floor holds") {
    import graft.functions.{TextKernels, VectorKernels}
    // independent reimplementation: materialize the ±1 centroid explicitly
    // from mix64 bits, then dot with the same ascending-d double widening
    val v = Array.tabulate(64)(i => ((i * 37 % 13) - 6) / 7.0f)
    for (c <- 0 until 16) {
      val base = 101L + c * 1000003L
      val h = TextKernels.mix64(base)
      val centroid = Array.tabulate(64)(d => if (((h >>> d) & 1L) == 1L) 1.0 else -1.0)
      var expected = 0.0
      for (d <- 0 until 64) expected += centroid(d) * v(d).toDouble
      assert(VectorKernels.rademacherCellScore(v, 101L, c) == expected, s"cell $c")
    }
    // scale invariance of the argmax (assignment must not depend on norm)
    val scaled = v.map(_ * 7.5f)
    def argmax(x: Array[Float]) =
      (0 until 16).maxBy(c => (VectorKernels.rademacherCellScore(x, 101L, c), -c))
    assert(argmax(v) == argmax(scaled))
    // portable mode stays a usable ANN on real embeddings
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where($"vec_id" < 30)
    val truth = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val found = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      k = 3, nCells = 16, nProbe = 4, seed = 101L, portableCentroids = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.4, s"portable IVF recall $recall over ${truth.size} true pairs")
  }

  test("schema evolution: rename coalesces spellings, added column backfills NULL") {
    val dir = graft.sources.Scratch.dir(spark, "schevo", "spec")
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price_v1")
      .write.mode("overwrite").parquet(s"$dir/b=1")
    Seq((3L, 30.0, "EUR")).toDF("k", "price", "currency")
      .write.mode("overwrite").parquet(s"$dir/b=2")
    val got = graft.sources.SchemaEvolution
      .readMerged(spark, dir, Map("price_v1" -> "price"))
      .select("k", "price", "currency")
      .as[(Long, Double, Option[String])].collect().toSet
    assert(got == Set((1L, 10.0, None), (2L, 20.0, None),
      (3L, 30.0, Some("EUR"))))
    // rename-only case: no batch ever wrote the new spelling
    val dir2 = graft.sources.Scratch.dir(spark, "schevo", "spec2")
    Seq((1L, 5.0)).toDF("k", "price_v1")
      .write.mode("overwrite").parquet(s"$dir2/b=1")
    val only = graft.sources.SchemaEvolution
      .readMerged(spark, dir2, Map("price_v1" -> "price"))
    assert(only.columns.contains("price") && !only.columns.contains("price_v1"))
  }
}
