package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Archive decompress-on-ingest (reference: net2demy/Execute.scala:63-380
  * — the archive branch of its download loop streams a fetched `.zip`
  * through `java.util.zip.ZipInputStream` (Execute.scala:395+) or a `.7z`
  * through commons-compress' SevenZFile (Execute.scala:350+), and lands
  * every entry as its own storage file, flattening entry paths with
  * `/` → `-`; its crawl matcher also recognizes `.tar.gz` and `.bz2`
  * suffixes, Execute.scala:113).
  *
  * Spark-first re-expression: the unit of parallelism is the ARCHIVE — a
  * landing zone holds many archives (one per crawl batch / source), so a
  * `binaryFile` scan distributes one task per archive and each task
  * streams its own decoder; entries are written straight to the
  * destination through the task-side Hadoop FileSystem (hdfs/s3a/file —
  * the TarShards write discipline). Within one archive the stream is
  * inherently sequential (DEFLATE/LZMA have no random access), which is
  * the right trade at 100 TB: archives are many and modest, entries
  * stream at IO speed, and no driver ever holds file bytes.
  *
  * Codec matrix — every decoder is a Spark-BUNDLED public jar (the
  * declared unmanaged classpath, zero new dependencies):
  *  - `.zip`            → `java.util.zip.ZipInputStream` (JDK)
  *  - `.7z`             → commons-compress `SevenZFile` (LZMA/LZMA2 via
  *                        the bundled tukaani xz jar) — the reference's
  *                        own 7z decoder
  *  - `.tar.gz`/`.tgz`  → JDK GZIP + the ustar parser shared with
  *                        [[TarShards]]
  *  - `.gz`/`.bz2`/`.xz` (single-file) → JDK GZIP / commons-compress
  *                        BZip2/XZ; one output named minus the suffix
  * Unrecognized extensions are skipped (reported nowhere — the landing
  * zone contract is "archives only", mirror of the reference's explicit
  * suffix regex).
  */
object ArchiveIngest {

  /** Stream every entry of every archive under `srcDir` into `destDir`,
    * one output file per entry, entry paths flattened with `/` → `-`
    * (the reference's zname convention; directory entries are skipped).
    * Name collisions across archives are the caller's contract, exactly
    * as in the reference (last write wins, nondeterministically — keep
    * archive contents disjoint). Returns the ingest manifest:
    * (archive, entry, dest_name, n_bytes), one row per landed file.
    *
    * The extraction job runs EAGERLY inside this call (the manifest is
    * locally checkpointed): every destination file lands exactly once
    * before the method returns, and re-reading the returned manifest can
    * never silently re-run the side-effecting write. Destination writes
    * go through the DRIVER's Hadoop configuration (spark.hadoop.* /
    * session settings), serialized into the tasks — credentials and
    * endpoints set via SparkConf reach hdfs://, s3a://, etc. */
  def extract(spark: SparkSession, srcDir: String, destDir: String,
              glob: String = "*"): DataFrame = {
    val schema = StructType(Seq(
      StructField("archive", StringType),
      StructField("entry", StringType),
      StructField("dest_name", StringType),
      StructField("n_bytes", LongType)))
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rdd = TarShards.streamedEntries(spark, s"$srcDir/$glob", entryStream)
      .mapPartitions { it =>
        it.map { case (archive, name, bytes) =>
          val fs = new org.apache.hadoop.fs.Path(destDir)
            .getFileSystem(hconf.value)
          val zname = name.replaceAll("/", "-")
          val out = fs.create(
            new org.apache.hadoop.fs.Path(s"$destDir/$zname"), true)
          try out.write(bytes) finally out.close()
          Row(archive, name, zname, bytes.length.toLong)
        }
      }
    graft.operators.Materialize.round(spark.createDataFrame(rdd, schema))
  }

  /** Distributed entry scan WITHOUT landing files: (archive, name, bytes)
    * per regular entry — for pipelines that ingest archive contents
    * directly into a table instead of re-materializing loose files. */
  def read(spark: SparkSession, srcDir: String,
           glob: String = "*"): DataFrame = {
    val schema = StructType(Seq(
      StructField("archive", StringType),
      StructField("name", StringType),
      StructField("bytes", BinaryType)))
    val rdd = TarShards.streamedEntries(spark, s"$srcDir/$glob", entryStream)
      .map { case (archive, n, b) => Row(archive, n, b) }
    spark.createDataFrame(rdd, schema)
  }

  /** STREAMING per-archive decoder (round 17): entries come one at a
    * time off an fs.open stream — at no point does a task hold the whole
    * archive, let alone its decompressed contents (the prior binaryFile
    * path buffered both: a 1.5 GB .tar.gz decompressing to 12 GB cost
    * ~25 GB of one task's heap and archives past 2 GB failed outright on
    * binaryFile's Int cap). Only `.7z` needs random access (its header
    * sits at both ends); that gets a seekable-channel VIEW of the fs
    * stream — still never a full in-memory copy. */
  private def entryStream(fileName: String,
                          fs: org.apache.hadoop.fs.FileSystem,
                          path: org.apache.hadoop.fs.Path)
    : Iterator[(String, Array[Byte])] = {
    val lower = fileName.toLowerCase
    def open() = new java.io.BufferedInputStream(fs.open(path), 1 << 16)
    if (lower.endsWith(".zip")) zipEntryStream(open())
    else if (lower.endsWith(".7z"))
      sevenZEntryStream(fs.open(path), fs.getFileStatus(path).getLen)
    else if (lower.endsWith(".tar.gz") || lower.endsWith(".tgz"))
      TarShards.parseTarStream(new java.util.zip.GZIPInputStream(open()))
    else if (lower.endsWith(".gz"))
      Iterator(chopExt(fileName) -> drain(
        new java.util.zip.GZIPInputStream(open())))
    else if (lower.endsWith(".bz2"))
      Iterator(chopExt(fileName) -> drain(
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(open())))
    else if (lower.endsWith(".xz"))
      Iterator(chopExt(fileName) -> drain(
        new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(open())))
    else Iterator.empty
  }

  /** Decode one in-memory archive by filename extension (see the codec
    * matrix above); unrecognized extensions yield no entries. BYTE-ARRAY
    * convenience for callers that already hold an archive on the heap
    * (fixtures, small crawl payloads) — the distributed scans stream via
    * [[read]]/[[extract]] and never take this path. The tar.gz branch
    * still parses entry-at-a-time off the decompressor (no whole
    * decompressed tar is ever materialized). */
  def entriesOf(fileName: String, bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val lower = fileName.toLowerCase
    if (lower.endsWith(".zip")) zipEntriesOf(bytes)
    else if (lower.endsWith(".7z")) sevenZEntriesOf(bytes)
    else if (lower.endsWith(".tar.gz") || lower.endsWith(".tgz"))
      TarShards.parseTarStream(new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))).toSeq
    else if (lower.endsWith(".gz"))
      Seq(chopExt(fileName) -> drain(new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))))
    else if (lower.endsWith(".bz2"))
      Seq(chopExt(fileName) -> drain(
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(bytes))))
    else if (lower.endsWith(".xz"))
      Seq(chopExt(fileName) -> drain(
        new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(
          new java.io.ByteArrayInputStream(bytes))))
    else Seq.empty
  }

  private def chopExt(name: String): String =
    name.substring(0, name.lastIndexOf('.'))

  private def drain(in: java.io.InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    try {
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    } finally in.close()
    buf.toByteArray
  }

  /** Decode one in-memory zip through ZipInputStream (the streaming
    * decoder, not ZipFile's central-directory random access — matches the
    * reference and needs no temp file). Directory entries are skipped. */
  def zipEntriesOf(zipBytes: Array[Byte]): Seq[(String, Array[Byte])] =
    zipEntryStream(new java.io.ByteArrayInputStream(zipBytes)).toSeq

  /** Streaming zip decode: one entry at a time off `in`; the iterator
    * closes the stream when entries are exhausted. */
  def zipEntryStream(in: java.io.InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val zis = new java.util.zip.ZipInputStream(in)
      private var nextEntry: (String, Array[Byte]) = null
      private def advance(): Unit = {
        nextEntry = null
        var e = zis.getNextEntry
        while (e != null && nextEntry == null) {
          if (!e.isDirectory) nextEntry = e.getName -> drain2(zis)
          zis.closeEntry()
          if (nextEntry == null) e = zis.getNextEntry
        }
        if (nextEntry == null) zis.close()
      }
      advance()
      override def hasNext: Boolean = nextEntry != null
      override def next(): (String, Array[Byte]) = {
        val e = nextEntry; advance(); e
      }
    }

  /** Streaming 7z decode over a SEEKABLE VIEW of the fs stream (7z
    * headers need random access; FSDataInputStream seeks natively, so no
    * in-memory copy is required). The iterator closes everything when
    * entries are exhausted. */
  private def sevenZEntryStream(in: org.apache.hadoop.fs.FSDataInputStream,
                                len: Long): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val sz = org.apache.commons.compress.archivers.sevenz.SevenZFile
        .builder().setSeekableByteChannel(new FsSeekableChannel(in, len)).get()
      private var nextEntry: (String, Array[Byte]) = null
      private def advance(): Unit = {
        nextEntry = null
        var e = sz.getNextEntry
        while (e != null && nextEntry == null) {
          if (!e.isDirectory) {
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](64 * 1024)
            var n = sz.read(chunk)
            while (n > 0) { buf.write(chunk, 0, n); n = sz.read(chunk) }
            nextEntry = e.getName -> buf.toByteArray
          } else e = sz.getNextEntry
        }
        if (nextEntry == null) sz.close()
      }
      advance()
      override def hasNext: Boolean = nextEntry != null
      override def next(): (String, Array[Byte]) = {
        val e = nextEntry; advance(); e
      }
    }

  /** Read-only SeekableByteChannel over an FSDataInputStream — gives
    * commons-compress the random access 7z needs without buffering the
    * archive (hdfs/s3a/file streams all seek). */
  private class FsSeekableChannel(in: org.apache.hadoop.fs.FSDataInputStream,
                                  len: Long)
    extends java.nio.channels.SeekableByteChannel {
    private var open = true
    override def read(dst: java.nio.ByteBuffer): Int = {
      val pos = in.getPos
      if (pos >= len) -1
      else {
        val want = math.min(dst.remaining().toLong, len - pos).toInt
        val buf = new Array[Byte](want)
        val n = in.read(buf, 0, want)
        if (n > 0) dst.put(buf, 0, n)
        n
      }
    }
    override def write(src: java.nio.ByteBuffer): Int =
      throw new UnsupportedOperationException("read-only channel")
    override def position(): Long = in.getPos
    override def position(p: Long): java.nio.channels.SeekableByteChannel = {
      in.seek(p); this
    }
    override def size(): Long = len
    override def truncate(s: Long): java.nio.channels.SeekableByteChannel =
      throw new UnsupportedOperationException("read-only channel")
    override def isOpen: Boolean = open
    override def close(): Unit = { open = false; in.close() }
  }

  // drain without closing (the stream owns multiple entries)
  private def drain2(in: java.io.InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](64 * 1024)
    var n = in.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    buf.toByteArray
  }

  /** Decode one in-memory 7z archive (the reference's SevenZFile path;
    * 7z headers need random access, which SeekableInMemoryByteChannel
    * provides without a temp file). Directory entries are skipped. */
  def sevenZEntriesOf(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val ch = new org.apache.commons.compress.utils.SeekableInMemoryByteChannel(bytes)
    val sz = org.apache.commons.compress.archivers.sevenz.SevenZFile
      .builder().setSeekableByteChannel(ch).get()
    val out = Seq.newBuilder[(String, Array[Byte])]
    try {
      var entry = sz.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](64 * 1024)
          var n = sz.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = sz.read(chunk) }
          out += entry.getName -> buf.toByteArray
        }
        entry = sz.getNextEntry
      }
    } finally sz.close()
    out.result()
  }

  /** Write (key, text) rows as zip archives, one per partition, at
    * `dir/prefix-NNNNN.zip`, entry `<key>.txt` per row — the fixture/
    * export twin of [[extract]] (the reference only ever CONSUMES
    * archives; producing them here gives round-trip tests and a compact
    * text-export sink). Entry mtimes are pinned to epoch so archive
    * bytes are deterministic for a given partitioning. */
  def writeZip(df: DataFrame, keyCol: String, textCol: String, dir: String,
               prefix: String = "batch"): Unit = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(keyCol).cast("string").as("_k_"),
        col(textCol).cast("string").as("_t_"))
      .rdd.foreachPartition { it =>
        // an entry-less ZipOutputStream throws on close — an empty
        // partition lands no archive at all
        if (it.hasNext) {
          val pid = TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(f"$dir/$prefix-$pid%05d.zip")
          val fs = path.getFileSystem(hconf.value)
          val zos = new java.util.zip.ZipOutputStream(
            new java.io.BufferedOutputStream(fs.create(path, true)))
          try {
            it.foreach { r =>
              val e = new java.util.zip.ZipEntry(r.getAs[String]("_k_") + ".txt")
              e.setTime(0L)
              zos.putNextEntry(e)
              zos.write(r.getAs[String]("_t_").getBytes("UTF-8"))
              zos.closeEntry()
            }
          } finally zos.close()
        }
      }
  }
}
