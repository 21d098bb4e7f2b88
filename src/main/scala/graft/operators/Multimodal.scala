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
  * THE CODEC IS A STUB: this container has no image/audio libraries, so
  * `decodeStub` derives deterministic pseudo-features from the bytes
  * (length, checksum, fake dimensions). The surrounding plumbing — schema,
  * batch shape, partitioning, null handling — is real and tested; swapping
  * in a JNI/javacv decoder only replaces the function body.
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

  /** Deterministic fake media table derived from a seed column — stands in
    * for `spark.read.format("binaryFile")` in this container. */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame = df
    .select(col(idCol).cast(LongType).as("media_id"))
    .withColumn("bytes",
      // deterministic pseudo-bytes: sha2 of the id, repeated
      to_binary(repeat(sha2(col("media_id").cast(StringType), 256), 4), lit("hex")))
    .withColumn("meta", struct(
      lit("image/png").as("mime"),
      (pmod(col("media_id"), lit(4)) * 64 + 64).cast(IntegerType).as("width"),
      (pmod(col("media_id"), lit(3)) * 64 + 64).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")))

  /** STUB decode: bytes -> feature vector. Deterministic in the bytes.
    * Real implementation would decode pixels and pool; the signature,
    * batching, and output schema are what matters here. */
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
    * way Arrow batch size does. Output: (media_id, meta, features). */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("meta", mediaMetaType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select("media_id", "bytes", "meta").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch work area: a real decoder would allocate its buffers
        // here once per batch, not per row
        batch.iterator.map { r =>
          val feats = decodeStub(r.getAs[Array[Byte]]("bytes"), dim)
          Row(r.getAs[Long]("media_id"), r.getAs[Row]("meta"), feats)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling plumbing for video-like media: emit `nFrames` rows per
    * media row (frame_index + per-frame features), the explode-shaped
    * output a real frame sampler produces. */
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
