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
  * IMAGE DECODE IS REAL: PNG bytes are decoded to pixels with the JDK's
  * `javax.imageio` and pooled into luminance-strip features — no native
  * libraries needed. The VIDEO path stays a stub (`decodeStub` over frame
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
