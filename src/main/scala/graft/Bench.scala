package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR, one warmup pass (JIT + codegen + file-listing
  * caches) then one timed pass, materializing through the noop sink so
  * the full plan executes without count()-style column pruning.
  * Prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench][$phase] $name $sec%.2f s")
      sec
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Phase 1: warm up EVERYTHING first (JIT compilation of Spark's own
    // hot paths dominates the first ~30s of a fresh JVM; interleaving
    // warmup and timing attributes that storm to whichever queries run
    // early). Phase 2: timed runs against a settled JVM.
    val ok = names.filter { name =>
      try { runOnce(name, "warmup"); true }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
    }
    // Three full timed passes, min per query. The host shows multi-
    // minute CPU-steal bursts (shared infra); interleaving passes means
    // a burst hits each query at most once, and min-of-3 approximates
    // the uncontended runtime.
    val timed = (1 to 3).map(i => ok.map(n => n -> runOnce(n, s"pass$i")).toMap)
    val results = ok.map(n => n -> timed.map(_(n)).min)
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
