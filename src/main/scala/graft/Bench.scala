package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR, one warmup pass (JIT + codegen + file-listing
  * caches) then GRAFT_BENCH_PASSES timed passes (default 1),
  * materializing through the noop sink so the full plan executes
  * without count()-style column pruning. A wall-clock deadline
  * (GRAFT_BENCH_DEADLINE_SEC, default 900) stops remaining timed
  * work early — the JSON line is ALWAYS emitted, falling back to
  * warmup times for queries the deadline cut off. Prints ONE JSON
  * line on stdout.
  *
  * Why min-per-query over passes: this host shows multi-minute
  * CPU-steal bursts (shared infra); min over interleaved passes
  * approximates the uncontended runtime. With the default single
  * timed pass the total budget is ~2x one full catalog sweep, which
  * fits the driver's timeout even under one noise burst.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("GRAFT_BENCH_PASSES", "1").toInt
    val deadlineSec = sys.env.getOrElse("GRAFT_BENCH_DEADLINE_SEC", "900").toLong
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String, phase: String): Double = {
      val q0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - q0) / 1e9
      System.err.println(f"[bench][$phase] $name $sec%.2f s (t=$elapsed%.0f s)")
      sec
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Phase 1: warm up EVERYTHING first (JIT compilation of Spark's own
    // hot paths dominates the first ~30s of a fresh JVM; interleaving
    // warmup and timing attributes that storm to whichever queries run
    // early). Warmup times are recorded as a fallback in case the
    // deadline cuts a query's timed pass.
    val best = collection.mutable.LinkedHashMap.empty[String, Double]
    for (name <- names) {
      try best(name) = runOnce(name, "warmup")
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
    }
    // Phase 2: timed passes against a settled JVM, min per query,
    // stopping (mid-pass if needed) once the deadline is reached.
    var cut = false
    for (i <- 1 to passes; name <- best.keys.toSeq) {
      if (elapsed >= deadlineSec) {
        if (!cut) System.err.println(
          f"[bench] deadline ${deadlineSec}s reached at $elapsed%.0f s — emitting with times so far")
        cut = true
      } else {
        try { val s = runOnce(name, s"pass$i"); if (s < best(name)) best(name) = s }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed in pass$i: ${e.getMessage}") }
      }
    }
    val qs = best.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = best.values.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
