package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.HashOps

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The decode kernels are STUBS (this container has no image/audio
  * libs): `decodeImageStub` produces a deterministic fake feature
  * vector from the bytes. Everything around the stub — schema,
  * batch-shaped iteration (`mapPartitions`, the Scala analogue of
  * `mapInPandas` batches), partitioning, output schema — is real and
  * tested; swapping in a real decoder changes only the kernel body.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  final case class MediaFeature(
      media_id: Long, n_bytes: Int, content_hash: Long,
      fake_width: Int, fake_height: Int, feature: Array[Float])

  /** STUB decode: a real implementation would decode the image and
    * extract features; this derives a deterministic 8-dim "embedding"
    * from the byte content so the distributed plumbing is exercised
    * end-to-end with verifiable outputs. */
  def decodeImageStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    val h = HashOps.fnv64(bytes)
    val feat = Array.tabulate(8)(i =>
      ((HashOps.mix64(h ^ i.toLong) >>> 40).toFloat / (1 << 24).toFloat) - 0.5f)
    MediaFeature(id, bytes.length, h,
      640 min (bytes.length % 1024), 480 min (bytes.length % 768), feat)
  }

  /** Batched feature extraction over (media_id, media) rows. Runs
    * partition-local with no shuffle; input partitioning is preserved.
    * The iterator never materializes a partition in memory. */
  def extractFeatures(df: DataFrame): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("media").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeImageStub(id, if (bytes == null) Array.emptyByteArray else bytes)
      })
  }

  /** STUB resize: recompute target dimensions preserving aspect ratio
    * (the arithmetic a real resizer performs before touching pixels;
    * the pixel resample itself would live in the decode kernel). */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("fake_width"),
      lit(maxH.toDouble) / col("fake_height"), lit(1.0))
    df.withColumn("out_width", floor(col("fake_width") * scale).cast("int"))
      .withColumn("out_height", floor(col("fake_height") * scale).cast("int"))
  }

  /** STUB frame sampling: a video becomes `n` evenly-spaced "frames"
    * (byte slices stand in for decoded frames). Output explodes rows —
    * the shape a real frame sampler has. */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("media").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val step = math.max(1, b.length / math.max(n, 1))
        (0 until n).iterator.map { i =>
          val off = math.min(i * step, math.max(b.length - 1, 0))
          (id, i, b.slice(off, math.min(off + step, b.length)))
        }
      }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
