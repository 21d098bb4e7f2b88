package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media is carried as an opaque `binary` column plus a typed metadata
  * struct — the layout Spark's own `binaryFile` source and the MLlib image
  * schema use. Decode / feature-extraction runs per partition over
  * Arrow-sized batches (`mapPartitions` with a bounded buffer), which is the
  * Scala analogue of `mapInPandas`: the executor streams batches, never
  * materializing a partition of decoded frames in memory.
  *
  * IMAGE AND AUDIO DECODE ARE REAL: PNG bytes are decoded to pixels with
  * the JDK's `javax.imageio` and pooled into luminance-strip features;
  * WAV bytes are decoded to PCM with `javax.sound.sampled` and pooled
  * into windowed-RMS energy envelopes — no native libraries needed for
  * either. Only the VIDEO path stays a stub (`decodeStub` over frame
  * byte slices): frame extraction needs a container demuxer this
  * environment doesn't ship; the explode-shaped plumbing around it is real.
  */
object Multimodal {

  /** media metadata struct: mime, width, height, durationMs (audio/video). */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("meta", mediaMetaType)))

  /** A real, deterministic PNG: gradient in red (x) and green (y) with an
    * id-dependent blue phase, encoded through `javax.imageio`. Every byte
    * is reproducible for a given (id, width, height), so fixture tests and
    * oracle projections stay stable. */
  def pngBytes(id: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = if (width <= 1) 0 else x * 255 / (width - 1)
        val g = if (height <= 1) 0 else y * 255 / (height - 1)
        val b = ((id * 37 + x + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val pngUdf = udf { (id: Long, w: Int, h: Int) => pngBytes(id, w, h) }

  /** Deterministic media table derived from a seed column — stands in for
    * `spark.read.format("binaryFile")` in this container. The bytes are a
    * REAL PNG per row (decodable by any codec), sized by the same formulas
    * the metadata advertises (16-64 px: enough to exercise a real encoder
    * and decoder without the fixture's deflate cost dominating a bench). */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame = df
    .select(col(idCol).cast(LongType).as("media_id"))
    .withColumn("meta", struct(
      lit("image/png").as("mime"),
      (pmod(col("media_id"), lit(4)) * 16 + 16).cast(IntegerType).as("width"),
      (pmod(col("media_id"), lit(3)) * 16 + 16).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")))
    .withColumn("bytes",
      pngUdf(col("media_id"), col("meta.width"), col("meta.height")))

  /** A real, deterministic WAV: 16-bit mono PCM of a two-harmonic tone
    * whose fundamental depends on the id, containered through
    * `javax.sound.sampled.AudioSystem.write`. StrictMath keeps the
    * synthesized samples bit-identical on any JVM/host; WAV is lossless,
    * so decode-side assertions can be EXACT, not tolerance-based. */
  def wavBytes(id: Long, sampleRate: Int = 8000, nSamples: Int = 1600): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    val freq = 220.0 + (id % 16) * 55.0
    var n = 0
    while (n < nSamples) {
      val t = n.toDouble / sampleRate
      val amp = (StrictMath.sin(2 * StrictMath.PI * freq * t) * 0.6 +
                 StrictMath.sin(2 * StrictMath.PI * freq * 2 * t) * 0.25) * 0.9
      val s = math.round(amp * Short.MaxValue).toShort
      pcm(2 * n) = (s & 0xFF).toByte // WAV PCM is little-endian
      pcm(2 * n + 1) = ((s >> 8) & 0xFF).toByte
      n += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val wavUdf = udf { (id: Long, n: Int) => wavBytes(id, nSamples = n) }

  /** Deterministic AUDIO media table (mime audio/wav, real WAV bytes per
    * row, duration advertised by the same formula the synthesis uses) —
    * the audio analogue of [[syntheticMedia]]. 0.1–0.3 s per row at 8 kHz:
    * real containers without the fixture dominating a bench. */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = df
    .select(col(idCol).cast(LongType).as("media_id"))
    .withColumn("_n_", (lit(800) + pmod(col("media_id"), lit(5)) * 400).cast(IntegerType))
    .withColumn("meta", struct(
      lit("audio/wav").as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      // integer div: Column./ is true division (double) and would change
      // the struct field's type away from the shared LongType meta schema
      expr("(cast(_n_ as bigint) * 1000) div 8000").as("duration_ms")))
    .withColumn("bytes", wavUdf(col("media_id"), col("_n_")))
    .drop("_n_")

  /** Real audio decode + pooling: `javax.sound.sampled` parses the
    * container (WAV in the JDK; any format with a registered SPI), frames
    * are mixed down to mono in [-1,1], and the RMS over `dim` equal time
    * windows forms the feature vector — the classic energy-envelope
    * descriptor. Returns null for null/undecodable/non-16-bit-PCM bytes
    * (same quarantine contract as [[decodeImageFeatures]]). */
  def decodeAudioFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return null
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return null
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          || fmt.getSampleSizeInBits != 16) return null
      val data = ais.readAllBytes()
      val channels = fmt.getChannels
      val bigEndian = fmt.isBigEndian
      val nFrames = data.length / (2 * channels)
      val out = new Array[Float](dim)
      if (nFrames == 0) return out
      val sums = new Array[Double](dim)
      val counts = new Array[Long](dim)
      var f = 0
      while (f < nFrames) {
        var c = 0
        var acc = 0.0
        while (c < channels) {
          val i = (f * channels + c) * 2
          val s =
            if (bigEndian) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
          acc += s / 32768.0
          c += 1
        }
        val v = acc / channels
        val w = math.min(f * dim / nFrames, dim - 1)
        sums(w) += v * v
        counts(w) += 1
        f += 1
      }
      var i = 0
      while (i < dim) {
        out(i) = if (counts(i) == 0) 0.0f
          else math.sqrt(sums(i) / counts(i)).toFloat
        i += 1
      }
      out
    } finally ais.close()
  }

  /** Real image decode + pooling: `javax.imageio` parses the container
    * bytes, then luminance means over `dim` vertical strips (strip s spans
    * columns [s·w/dim, (s+1)·w/dim)) form the feature vector — each value
    * in [0,1]. Returns null for null/undecodable bytes (a real pipeline
    * routes those to a quarantine sink rather than failing the job). */
  def decodeImageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return null
    val img =
      // NonFatal, not just IOException: ImageIO readers surface corrupt
      // chunk data as IllegalArgument/IndexOutOfBounds/NegativeArraySize
      // wrappers too, and the quarantine contract must hold for all of them
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    // bulk getRGB: one array copy per image instead of w*h virtual calls —
    // the difference between the decoder and the accessor dominating
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = px(y * w + x)
        val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / (3.0 * 255.0)
        val s = math.min(x * dim / w, dim - 1)
        sums(s) += lum
        counts(s) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat
      i += 1
    }
    out
  }

  /** STUB decode for media without a JDK codec (video frames): bytes ->
    * deterministic pseudo-features. The signature, batching, and output
    * schema are what a real demuxer drops into. */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return null
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Batched decode/feature-extract over the media table: the Scala
    * `mapInPandas` analogue. `batchSize` bounds executor memory exactly the
    * way Arrow batch size does. Image mimes decode REAL pixels through
    * `javax.imageio`; anything else falls back to the stub codec.
    * Output: (media_id, meta, features). */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("meta", mediaMetaType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select("media_id", "bytes", "meta").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch work area: a real decoder allocates its buffers here
        // once per batch, not per row
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val meta = r.getAs[Row]("meta")
          val mime = if (meta == null) null else meta.getAs[String]("mime")
          val feats =
            if (mime != null && mime.startsWith("image/"))
              decodeImageFeatures(bytes, dim)
            else if (mime != null && mime.startsWith("audio/"))
              decodeAudioFeatures(bytes, dim)
            else decodeStub(bytes, dim)
          Row(r.getAs[Long]("media_id"), meta, feats)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling plumbing for video-like media: emit `nFrames` rows per
    * media row (frame_index + per-frame features), the explode-shaped
    * output a real frame sampler produces. Stub codec: a real demuxer
    * would seek keyframes instead of slicing the byte stream. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4, dim: Int = 8): DataFrame = {
    val frameUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[(Int, Seq[Float])]
      else (0 until nFrames).map { f =>
        // deterministic per-frame slice of the byte stream
        val slice = bytes.slice(f * 8, f * 8 + 64)
        (f, decodeStub(slice, dim).toSeq)
      }
    }
    media.select(col("media_id"),
        explode(frameUdf(col("bytes"))).as("frame"))
      .select(col("media_id"), col("frame._1").as("frame_index"),
        col("frame._2").as("features"))
  }
}
