package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar shards — the training-ingest format for
  * multimodal corpora at scale. No reference analogue; this is an
  * LLM-pipeline addition: a 100 TB training job wants a few large
  * SEQUENTIALLY-READ files per worker, not millions of small objects, and
  * the de-facto layout (WebDataset) is plain POSIX tar archives whose
  * consecutive entries `<key>.<ext>` group the modalities of one sample.
  *
  * Both directions are hand-rolled ustar (the same no-external-deps
  * approach as `Shapefile`/the AVI demuxer):
  *  - [[write]] emits one shard per partition (`prefix-NNNNN.tar`), each
  *    sample contributing `<key>.txt` + optional `<key>.bin` entries,
  *    consecutive, with zeroed mtime/uid/gid so shard bytes are
  *    deterministic for a given partitioning.
  *  - [[read]] distributes by shard file (`binaryFile` scan) and streams
  *    each archive's entries in order — the sequential-IO access pattern
  *    shards exist for. Headers are checksum-verified; a corrupt header
  *    stops that shard's scan (quarantine: surviving entries still land).
  */
object TarShards {

  private val BLOCK = 512

  private def headerBlock(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes("US-ASCII")
    require(nameBytes.length <= 100, s"tar entry name too long: $name")
    val h = new Array[Byte](BLOCK)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    put(100, "0000644\u0000")            // mode
    put(108, "0000000\u0000")            // uid — zeroed: deterministic bytes
    put(116, "0000000\u0000")            // gid
    put(124, f"$size%011o" + "\u0000")   // size, octal
    put(136, "00000000000\u0000")        // mtime 0: rewrites are bit-stable
    h(156) = '0'                         // typeflag: regular file
    put(257, "ustar\u0000")              // magic
    put(263, "00")                       // version
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field = spaces
    var sum = 0L; var i = 0
    while (i < BLOCK) { sum += h(i) & 0xFF; i += 1 }
    put(148, f"$sum%06o" + "\u0000 ")
    h
  }

  private def pad(out: java.io.OutputStream, size: Long): Unit = {
    val rem = (size % BLOCK).toInt
    if (rem != 0) out.write(new Array[Byte](BLOCK - rem))
  }

  /** Write (key, text, media?) rows as tar shards, one per partition, at
    * `dir/prefix-NNNNN.tar`. Each row emits `<key>.txt` (UTF-8 text) and,
    * when `binCol` is set and non-null, `<key>.bin` immediately after —
    * the WebDataset sample-grouping contract. Shard count = partition
    * count: `repartition(n)` upstream to size shards (the knob a 100 TB
    * writer tunes so each shard is a few hundred MB of sequential IO). */
  def write(df: DataFrame, keyCol: String, textCol: String, dir: String,
            prefix: String = "shard", binCol: Option[String] = None): Unit = {
    val cols = col(keyCol).cast("string").as("_k_") +:
      col(textCol).cast("string").as("_t_") +:
      binCol.map(c => col(c).as("_b_")).toSeq
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(cols: _*).rdd.foreachPartition { it =>
      val pid = TaskContext.getPartitionId()
      val path = new org.apache.hadoop.fs.Path(f"$dir/$prefix-$pid%05d.tar")
      // driver Hadoop conf serialized into the task: spark.hadoop.* /
      // session credentials and endpoints reach hdfs://, s3a://, etc.;
      // local runs fall back to file://. create() makes parent dirs.
      val fs = path.getFileSystem(hconf.value)
      val out = new java.io.BufferedOutputStream(fs.create(path, true))
      try {
        it.foreach { r =>
          val key = r.getAs[String]("_k_")
          // dirty rows must fail BY NAME before this row's bytes land —
          // a bare NPE or a mid-header charset mangle would leave a
          // truncated shard with no row-identifying message (and
          // US-ASCII getBytes silently maps non-ASCII to '?', colliding
          // entry names across distinct keys)
          require(key != null,
            "TarShards.write: NULL key — filter or coalesce the key " +
              "column upstream")
          require(key.forall(c => c >= 0x20 && c < 0x7f),
            s"TarShards.write: key '$key' contains non-printable-ASCII " +
              "characters — ustar entry names are ASCII; sanitize keys " +
              "upstream")
          val textV = r.getAs[String]("_t_")
          require(textV != null,
            s"TarShards.write: NULL text for key '$key' — filter or " +
              "coalesce the text column upstream")
          val text = textV.getBytes("UTF-8")
          out.write(headerBlock(s"$key.txt", text.length))
          out.write(text); pad(out, text.length)
          if (binCol.isDefined) {
            val bin = r.getAs[Array[Byte]]("_b_")
            if (bin != null) {
              out.write(headerBlock(s"$key.bin", bin.length))
              out.write(bin); pad(out, bin.length)
            }
          }
        }
        out.write(new Array[Byte](2 * BLOCK)) // end-of-archive marker
      } finally out.close()
    }
  }

  /** Parse one ustar archive held in memory: (name, bytes) entries in
    * file order — the byte-array convenience over [[parseTarStream]]
    * (same quarantine semantics). Callers with a whole archive on the
    * heap only; the scale path streams. */
  def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    parseTarStream(new java.io.ByteArrayInputStream(bytes)).toSeq

  /** STREAMING ustar parser: one entry at a time off `in`, never holding
    * more than one entry's bytes (plus one 512-byte header) on the heap —
    * the round-17 fix for archive ingest buffering whole decompressed
    * tars. Stops at the zero block, EOF, a checksum-invalid header
    * (quarantine: surviving entries still land), or a truncated body.
    * The iterator closes `in` when it stops. */
  def parseTarStream(in: java.io.InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val header = new Array[Byte](BLOCK)
      private var nextEntry: (String, Array[Byte]) = null
      private var done = false

      private def readFully(buf: Array[Byte], len: Int): Boolean = {
        var got = 0
        while (got < len) {
          val n = in.read(buf, got, len - got)
          if (n < 0) return false
          got += n
        }
        true
      }

      private def stop(): Unit = { done = true; in.close() }

      private def advance(): Unit = {
        nextEntry = null
        while (nextEntry == null && !done) {
          if (!readFully(header, BLOCK)) { stop(); return }
          var allZero = true
          var i = 0
          while (allZero && i < BLOCK) { if (header(i) != 0) allZero = false; i += 1 }
          if (allZero) { stop(); return }
          // verify checksum before trusting the size field
          var sum = 0L
          i = 0
          while (i < BLOCK) {
            sum += (if (i >= 148 && i < 156) ' '.toByte else header(i)) & 0xFF
            i += 1
          }
          if (octal(header, 148, 8) != sum) { stop(); return }
          val nameEnd = {
            var j = 0; while (j < 100 && header(j) != 0) j += 1; j
          }
          val name = new String(header, 0, nameEnd, "US-ASCII")
          val size = octal(header, 124, 12)
          // one entry is one sample's modality — gigabyte entries mean a
          // corrupt size field or a mis-packed shard, refuse before the
          // allocation (Int/heap safety on file-supplied sizes)
          if (size < 0 || size > Int.MaxValue - BLOCK) { stop(); return }
          val padded = ((size + BLOCK - 1) / BLOCK) * BLOCK
          if (header(156) == '0' || header(156) == 0) {
            val body = new Array[Byte](size.toInt)
            if (!readFully(body, size.toInt)) { stop(); return }
            if (!skipFully(padded - size)) { stop(); return }
            nextEntry = name -> body
          } else if (!skipFully(padded)) { stop(); return }
        }
      }

      private def skipFully(n: Long): Boolean = {
        var left = n
        val junk = new Array[Byte](BLOCK)
        while (left > 0) {
          val r = in.read(junk, 0, math.min(left, BLOCK.toLong).toInt)
          if (r < 0) return false
          left -= r
        }
        true
      }

      advance()
      override def hasNext: Boolean = nextEntry != null
      override def next(): (String, Array[Byte]) = {
        val e = nextEntry; advance(); e
      }
    }

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = off
    while (i < off + len) {
      val c = b(i)
      if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
      i += 1
    }
    v
  }

  /** Distributed shard scan: one task per shard file, entries GENUINELY
    * streamed in archive order off an fs.open stream — never the whole
    * shard on one heap (round 17: the binaryFile scan loaded each full
    * archive as one Array[Byte], an executor OOM at multi-GB shards and
    * a hard 2 GB cap). Listing is driver-side glob metadata, same as
    * binaryFile's own listing. Output: (shard, name, bytes). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("name", StringType),
      StructField("bytes", BinaryType)))
    val rdd = streamedEntries(spark, s"$dir/*.tar",
      (_, fs, p) => parseTarStream(
        new java.io.BufferedInputStream(fs.open(p), 1 << 16)))
      .map { case (shard, n, b) => Row(shard, n, b) }
    spark.createDataFrame(rdd, schema)
  }

  /** Shared stream-scan harness: glob `pattern` on the driver (metadata
    * only), one task per file, `decode(name, fs, path)` yields the
    * entry iterator. Used by this scan and [[ArchiveIngest]]. */
  private[sources] def streamedEntries(
      spark: SparkSession, pattern: String,
      decode: (String, org.apache.hadoop.fs.FileSystem,
               org.apache.hadoop.fs.Path) => Iterator[(String, Array[Byte])])
    : org.apache.spark.rdd.RDD[(String, String, Array[Byte])] = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val globPath = new org.apache.hadoop.fs.Path(pattern)
    val fs0 = globPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = Option(fs0.globStatus(globPath)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).toSeq.sorted
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(hconf.value)
        decode(path.getName, fs, path)
          .map { case (n, b) => (path.getName, n, b) }
      }
  }
}
