package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ArchiveIngest

/** Specs for archive decompress-on-ingest (the cr03 gate hash-matches
  * byte lengths over ASCII zips; these pin exact CONTENT equality
  * including multibyte text, the reference's `/` → `-` path flattening,
  * directory entry skipping, the write/read round trip, and every other
  * codec lane — 7z, gz, bz2, xz, tar.gz — each through the same
  * Spark-bundled decoders the distributed path uses). */
class ArchiveIngestSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def mkZip(entries: Seq[(String, Array[Byte])],
                    dirs: Seq[String] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    dirs.foreach { d =>
      zos.putNextEntry(new java.util.zip.ZipEntry(d)); zos.closeEntry()
    }
    entries.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(b); zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("zip: content survives exactly, directories skipped") {
    val payload = Seq(
      "plain.txt" -> "hello".getBytes("UTF-8"),
      "data/nested/é-ü-文.txt" -> "héllo wörld 文字".getBytes("UTF-8"),
      "bin.dat" -> Array.tabulate(1000)(i => (i % 251).toByte))
    val got = ArchiveIngest.entriesOf("a.zip",
      mkZip(payload, dirs = Seq("data/", "data/nested/")))
    assert(got.map(_._1) == payload.map(_._1))
    got.zip(payload).foreach { case ((_, gb), (_, pb)) =>
      assert(java.util.Arrays.equals(gb, pb))
    }
  }

  test("7z: the reference's own archive format decodes (LZMA2 via bundled xz)") {
    val f = java.io.File.createTempFile("graft_spec", ".7z")
    f.deleteOnExit()
    val sz = new org.apache.commons.compress.archivers.sevenz.SevenZOutputFile(f)
    def add(name: String, bytes: Array[Byte], dir: Boolean = false): Unit = {
      val e = sz.createArchiveEntry(f, name) // name is what matters
      e.setDirectory(dir)
      sz.putArchiveEntry(e)
      if (!dir) sz.write(bytes)
      sz.closeArchiveEntry()
    }
    add("d/", Array.empty, dir = true)
    add("d/inner.txt", "seven zip ünïcode 文".getBytes("UTF-8"))
    add("top.bin", Array.tabulate(500)(i => (i % 17).toByte))
    sz.close()
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val got = ArchiveIngest.entriesOf("a.7z", bytes)
    assert(got.map(_._1) == Seq("d/inner.txt", "top.bin"))
    assert(new String(got.head._2, "UTF-8") == "seven zip ünïcode 文")
    assert(java.util.Arrays.equals(got(1)._2,
      Array.tabulate(500)(i => (i % 17).toByte)))
  }

  test("single-file gz / bz2 / xz lanes: one output named minus the suffix") {
    val payload = "single-file payload 文字".getBytes("UTF-8")
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(bos); o.write(b); o.close()
      bos.toByteArray
    }
    def bz2(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(bos)
      o.write(b); o.close(); bos.toByteArray
    }
    def xz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new org.apache.commons.compress.compressors.xz
        .XZCompressorOutputStream(bos)
      o.write(b); o.close(); bos.toByteArray
    }
    for ((fn, bytes) <- Seq("doc.json.gz" -> gz(payload),
        "doc.json.bz2" -> bz2(payload), "doc.json.xz" -> xz(payload))) {
      val got = ArchiveIngest.entriesOf(fn, bytes)
      assert(got.map(_._1) == Seq("doc.json"), fn)
      assert(java.util.Arrays.equals(got.head._2, payload), fn)
    }
  }

  test("tar.gz: gunzip + the shared ustar parser") {
    // build a tar via TarShards' writer on a 1-partition frame, then gzip
    val dir = graft.sources.Scratch.dir(spark, "zip", "spec_targz")
    graft.sources.TarShards.write(
      Seq((7L, "tar gz content")).toDF("k", "t").coalesce(1), "k", "t", dir)
    val tarBytes = java.nio.file.Files.readAllBytes(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
        .head.toPath)
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.util.zip.GZIPOutputStream(bos); o.write(tarBytes); o.close()
    val got = ArchiveIngest.entriesOf("shards.tar.gz", bos.toByteArray)
    assert(got.map(_._1) == Seq("7.txt"))
    assert(new String(got.head._2, "UTF-8") == "tar gz content")
  }

  test("unknown extensions yield no entries") {
    assert(ArchiveIngest.entriesOf("notes.txt", "plain".getBytes).isEmpty)
  }

  test("extract: lands flattened files with exact bytes + manifest, mixed codecs") {
    val src = graft.sources.Scratch.dir(spark, "zip", "spec_src")
    val dest = graft.sources.Scratch.dir(spark, "zip", "spec_dest")
    val zipBytes = mkZip(Seq(
      "a/b/deep.txt" -> "deep content".getBytes("UTF-8"),
      "top.txt" -> "top ünïcode".getBytes("UTF-8")), dirs = Seq("a/", "a/b/"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$src/one.zip"), zipBytes)
    val gzBos = new java.io.ByteArrayOutputStream()
    val gzo = new java.util.zip.GZIPOutputStream(gzBos)
    gzo.write("gz payload".getBytes("UTF-8")); gzo.close()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$src/side.json.gz"), gzBos.toByteArray)
    val manifestDf = ArchiveIngest.extract(spark, src, dest)
    // extract is EAGER: every destination file exists before any caller
    // action on the returned manifest (the must-materialize trap is gone)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dest/a-b-deep.txt")))
    val manifest = manifestDf.orderBy("entry").collect()
    assert(manifest.map(_.getAs[String]("dest_name")).toSeq ==
      Seq("a-b-deep.txt", "side.json", "top.txt")) // reference's / -> -
    val deep = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/a-b-deep.txt"))
    assert(new String(deep, "UTF-8") == "deep content")
    val side = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/side.json"))
    assert(new String(side, "UTF-8") == "gz payload")
    assert(manifest.map(r =>
      r.getAs[String]("dest_name") -> r.getAs[Long]("n_bytes")).toMap ==
      Map("a-b-deep.txt" -> 12L, "side.json" -> 10L,
        "top.txt" -> "top ünïcode".getBytes("UTF-8").length.toLong))
  }

  test("writeZip/read round trip: every row survives with exact text") {
    val dir = graft.sources.Scratch.dir(spark, "zip", "spec_rt")
    val rows = Seq((1L, "alpha"), (2L, "béta 文"), (3L, ""), (4L, "delta"))
    ArchiveIngest.writeZip(rows.toDF("k", "t").repartition(3, col("k")),
      "k", "t", dir)
    val got = ArchiveIngest.read(spark, dir, glob = "*.zip")
      .select(regexp_replace(col("name"), "\\.txt$", "").cast("long").as("k"),
        col("bytes").cast("string").as("t"))
      .as[(Long, String)].collect().toSet
    assert(got == rows.toSet)
    // fewer archives than partitions is fine; no empty archives exist
    val zips = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip"))
    assert(zips.nonEmpty && zips.forall(_.length() > 0))
  }
}
