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
          val text = r.getAs[String]("_t_").getBytes("UTF-8")
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

  /** Parse one ustar archive: (name, bytes) entries in file order. Stops
    * at the zero block, EOF, or the first checksum-invalid header. */
  def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + BLOCK <= bytes.length) {
      var allZero = true
      var i = off
      while (allZero && i < off + BLOCK) { if (bytes(i) != 0) allZero = false; i += 1 }
      if (allZero) return out.result()
      // verify checksum before trusting the size field
      var sum = 0L
      i = off
      while (i < off + BLOCK) {
        sum += (if (i - off >= 148 && i - off < 156) ' '.toByte else bytes(i)) & 0xFF
        i += 1
      }
      val stored = octal(bytes, off + 148, 8)
      if (stored != sum) return out.result()
      val nameEnd = {
        var j = off; while (j < off + 100 && bytes(j) != 0) j += 1; j
      }
      val name = new String(bytes, off, nameEnd - off, "US-ASCII")
      val size = octal(bytes, off + 124, 12)
      val body = off + BLOCK
      if (size < 0 || body + size > bytes.length) return out.result()
      if (bytes(off + 156) == '0' || bytes(off + 156) == 0)
        out += name -> java.util.Arrays.copyOfRange(bytes, body, body + size.toInt)
      off = body + (((size + BLOCK - 1) / BLOCK) * BLOCK).toInt
    }
    out.result()
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

  /** Distributed shard scan: one task per shard file, entries streamed in
    * archive order. Output: (shard, name, bytes). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("name", StringType),
      StructField("bytes", BinaryType)))
    val rdd = spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select(col("path"), col("content")).rdd
      .flatMap { r =>
        val shard = r.getAs[String]("path").split('/').last
        parseTar(r.getAs[Array[Byte]]("content"))
          .map { case (n, b) => Row(shard, n, b) }
      }
    spark.createDataFrame(rdd, schema)
  }
}
