package graft

import org.apache.spark.sql.functions._

import graft.ops.Scale

/** writeZOrdered: the layout claim, proven against file statistics.
  * Locality in z-order is locality in BOTH dimensions — so each
  * written file must cover a NARROW slice of x and of y, while a
  * plain sort by x leaves y unconstrained (full-range) in every file.
  * Readers prune on min/max stats, so per-file coverage IS the prune
  * rate. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def parquetFiles(path: String): Array[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)

  /** Per-file [min,max] coverage fraction of each 0..255 dimension,
    * worst dimension per file, averaged over files. */
  private def meanWorstCoverage(path: String): Double = {
    val files = parquetFiles(path)
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    val covs = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"x"), max($"x"), min($"y"), max($"y")).head()
      val xc = (r.getInt(1) - r.getInt(0) + 1) / 256.0
      val yc = (r.getInt(3) - r.getInt(2) + 1) / 256.0
      math.max(xc, yc)
    }
    covs.sum / covs.length
  }

  test("z-ordered files bound BOTH dims; x-sorted files leave y unbounded") {
    // deterministic pseudo-uniform 2-D points
    val df = spark.range(20000).select(
      (pmod(xxhash64($"id"), lit(256))).cast("int").as("x"),
      (pmod(xxhash64($"id" + 1000000), lit(256))).cast("int").as("y"),
      $"id".as("payload"))

    val zdir = java.nio.file.Files.createTempDirectory("zord").toString
    Scale.writeZOrdered(df, $"x", $"y", zdir, numFiles = 8)
    val zCov = meanWorstCoverage(zdir)

    val xdir = java.nio.file.Files.createTempDirectory("xsort").toString
    df.repartitionByRange(8, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xdir)
    val xCov = meanWorstCoverage(xdir)

    // a z-range of 1/8 of the curve is a few aligned quads: worst-dim
    // coverage well under the full range; x-sort leaves y at ~1.0
    assert(zCov < 0.8, f"z-order worst-dim coverage $zCov%.2f should prune")
    assert(xCov > 0.9, f"x-sort worst-dim coverage $xCov%.2f (y unbounded)")
    assert(zCov < xCov - 0.15, f"z-order ($zCov%.2f) must beat x-sort ($xCov%.2f)")

    // schema hygiene: the Morton key and its helpers order the write
    // but never leak into the written dataset
    val written = spark.read.parquet(zdir)
    assert(written.columns.toSeq === Seq("x", "y", "payload"),
      written.columns.mkString(","))
    // within every file, rows are sorted by the (recomputed) key — the
    // ordering the dropped column established survives in the layout
    parquetFiles(zdir).foreach { f =>
      val keys = spark.read.parquet(f)
        .select(expr(Scale.zorderExpr("x", "y")).cast("long").as("zk"))
        .collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), s"file $f not z-sorted")
    }
  }
}
