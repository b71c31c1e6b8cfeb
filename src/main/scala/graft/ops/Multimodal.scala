package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.HashOps

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The IMAGE path is real (round 12): [[sniffMime]] magic-byte
  * detection and a JDK-only [[decodeImage]] kernel
  * (`javax.imageio.ImageIO` + `BufferedImage` — zero extra deps) that
  * decodes genuine PNG/JPEG/GIF/BMP bytes into width/height and a
  * coarse 8-dim pixel-statistics feature vector, sampled on a fixed
  * grid so per-image cost is bounded regardless of resolution. Bytes
  * that are not a decodable image fall back to [[decodeImageStub]]'s
  * deterministic fake features, so mixed/dirty corpora never throw on
  * the executor. Audio/video decode remains stubbed (no codec libs in
  * the JDK): `sampleFrames` keeps the byte-slice stand-in, with the
  * real row-explosion shape.
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

  /** Real decoded-image features. `decoded=false` means the bytes were
    * not a decodable image and [[decodeImageStub]] supplied the
    * fields — the executor-safe fallback for dirty corpora. */
  final case class ImageFeature(
      media_id: Long, mime: String, decoded: Boolean,
      n_bytes: Int, content_hash: Long,
      width: Int, height: Int, feature: Array[Float])

  /** Magic-byte mime sniff — no decode, O(1), never throws. */
  def sniffMime(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (bytes != null && i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "image/png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "image/jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "image/gif"
    else if (at(0) == 'B' && at(1) == 'M') "image/bmp"
    else "application/octet-stream"
  }

  /** Grid resolution for [[decodeImage]]'s pixel statistics: 16×16
    * sample points bound the per-image feature cost at 256 getRGB
    * calls whether the image is 16px or 16,000px wide — the property
    * that keeps a 100 TB image-corpus scan CPU-bounded per row. */
  private val FeatureGrid = 16

  /** Decompression-bomb guard (r12 review): `ImageIO.read` materializes
    * the FULL raster, so a ~60 KB PNG declaring 30000×30000 pixels
    * would allocate gigabytes and kill the executor with an
    * `OutOfMemoryError` no `catch Exception` sees — then the stage
    * retries into the same row. Dimensions are therefore read from the
    * image HEADER (reader.getWidth/getHeight decode no pixel data) and
    * refused above this pixel cap BEFORE any raster exists; refused
    * images take the `decoded=false` stub fallback like any other
    * undecodable blob. 64 MP ≈ 256 MB ARGB — the largest raster worth
    * a 16×16 feature grid, and bounded per task slot. */
  private val MaxDecodePixels = 64L * 1024 * 1024

  /** Header-checked decode: dims first, full read only under the cap. */
  private def readImageGuarded(b: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis, /* seekForwardOnly = */ true)
        val w = reader.getWidth(0).toLong
        val h = reader.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) null
        else reader.read(0)
      } finally reader.dispose()
    } finally if (iis != null) iis.close()
  }

  /** REAL image decode kernel, JDK-only (`javax.imageio`): sniffs the
    * mime, decodes PNG/JPEG/GIF/BMP via `ImageIO.read`, and derives an
    * 8-dim coarse feature vector from a fixed [[FeatureGrid]]²
    * pixel-sample grid:
    * `[meanR, meanG, meanB, meanLuma, stdLuma, horizEdgeEnergy,
    *   aspectRatio, log10(area)]` (channel means in [0,1]).
    * Undecodable, non-image, or bomb-sized bytes (see
    * [[MaxDecodePixels]]) fall back to the deterministic stub
    * (`decoded=false`) instead of throwing — or OOM-ing — mid-task. */
  def decodeImage(id: Long, bytes: Array[Byte]): ImageFeature = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    val mime = sniffMime(b)
    val img =
      if (mime == "application/octet-stream") null
      else
        try readImageGuarded(b)
        catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) {
      val f = decodeImageStub(id, b)
      ImageFeature(id, mime, decoded = false, f.n_bytes, f.content_hash,
        f.fake_width, f.fake_height, f.feature)
    } else {
      val w = img.getWidth
      val h = img.getHeight
      val g = FeatureGrid
      var sr, sg, sb, sl, sl2, edge = 0.0
      var yi = 0
      while (yi < g) {
        val y = yi * (h - 1) / math.max(g - 1, 1)
        var prevLuma = -1.0
        var xi = 0
        while (xi < g) {
          val x = xi * (w - 1) / math.max(g - 1, 1)
          val rgb = img.getRGB(x, y)
          val r = ((rgb >>> 16) & 0xff) / 255.0
          val gc = ((rgb >>> 8) & 0xff) / 255.0
          val bc = (rgb & 0xff) / 255.0
          val luma = 0.299 * r + 0.587 * gc + 0.114 * bc
          sr += r; sg += gc; sb += bc; sl += luma; sl2 += luma * luma
          if (prevLuma >= 0.0) edge += math.abs(luma - prevLuma)
          prevLuma = luma
          xi += 1
        }
        yi += 1
      }
      val n = (g * g).toDouble
      val meanL = sl / n
      val varL = math.max(sl2 / n - meanL * meanL, 0.0)
      val feat = Array(
        (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
        meanL.toFloat, math.sqrt(varL).toFloat,
        (edge / (g * (g - 1).max(1))).toFloat,
        (w.toDouble / h).toFloat,
        math.log10(w.toDouble * h).toFloat)
      ImageFeature(id, mime, decoded = true, b.length, HashOps.fnv64(b), w, h, feat)
    }
  }

  /** Batched REAL feature extraction over (media_id, media) rows:
    * partition-local `mapPartitions` (no shuffle, streaming iterator),
    * one [[decodeImage]] per row. The kernel's fallback contract means
    * a single corrupt blob degrades to stub features instead of
    * failing the task (and with it, at scale, the stage). */
  def extractImageFeatures(df: DataFrame): Dataset[ImageFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("media").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeImage(id, bytes) })
  }

  /** Deterministic synthetic PNG: a w×h image whose pixel (x,y) color
    * is a hash mix of (seed, x, y), encoded by the JDK PNG writer.
    * Used by the `mm_decode` gate entry and MultimodalSpec to exercise
    * the REAL decode path end-to-end without binary fixtures on disk
    * (PNG is lossless, so decode recovers the exact pixels). */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = HashOps.mix64(seed ^ (x.toLong << 32) ^ y.toLong)
        img.setRGB(x, y, (m & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
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
