package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the optimization round — times the
  * components of the heaviest bench lines one by one (not part of the
  * graded surface; numbers land in OPTIMIZATION_r21.md). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .withExtensions(new graft.plans.GraftOptimizations())
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val which = if (args.nonEmpty) args(0) else "ivf"
    // settle JVM/codegen
    t("settle t1_map_project")(
      SparkEntry.queries("t1_map_project")(spark, dir)
        .write.format("noop").mode("overwrite").save())

    which match {
      case "ivf" =>
        val emb = graft.queries.Catalog.table(spark, dir, "embeddings")
        t("emb.count")(emb.count())
        val idx = t("buildIvf k=16 (fit only; assignment lazy)")(
          graft.ops.Ann.buildIvf(emb, "embedding", k = 16))
        val path = graft.queries.Batch13.freshIdxPath("probe_ivf", dir)
        t("persistIvf (assignment scan + partitioned write)")(
          graft.ops.Ann.persistIvf(idx, path))
        val loaded = t("loadIvf")(graft.ops.Ann.loadIvf(spark, path))
        t("assigned.count")(loaded.assigned.count())
        // MLlib alternatives on the same featured sample
        import org.apache.spark.ml.clustering.KMeans
        val featured = emb.select(
          org.apache.spark.ml.functions.array_to_vector(
            graft.functions.unit_vec(col("embedding"))).as("__features"))
        featured.cache().count()
        for (init <- Seq("k-means||", "random"); iter <- Seq(20, 8)) {
          t(s"KMeans init=$init maxIter=$iter (cached input)")(
            new KMeans().setK(16).setSeed(42L).setInitMode(init)
              .setMaxIter(iter)
              .setFeaturesCol("__features").fit(featured))
        }
      case "tune" =>
        val idx = t("ivfIndex memo build (fit_ivf_index shape)")(
          graft.queries.Batch3.ivfIndex(spark, dir))
        t("ann_tune_nprobe entry, run 1")(
          SparkEntry.queries("ann_tune_nprobe")(spark, dir)
            .write.format("noop").mode("overwrite").save())
        t("ann_tune_nprobe entry, run 2")(
          SparkEntry.queries("ann_tune_nprobe")(spark, dir)
            .write.format("noop").mode("overwrite").save())
      case "lsh" =>
        val thunks = graft.queries.Batch3.fitThunks(spark, dir).toMap
        t("fit_pair_counts (shared subtree)")(thunks("fit_pair_counts")())
        t("tuneLsh memo build (fit_tune_lsh increment)")(
          SparkEntry.queries("tune_lsh")(spark, dir)
            .write.format("noop").mode("overwrite").save())
        t("dedup_minhash_lsh")(
          SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
            .write.format("noop").mode("overwrite").save())
      case "compact" =>
        val emb = graft.queries.Catalog.table(spark, dir, "embeddings")
        val idx = t("buildIvf on even half")(
          graft.ops.Ann.buildIvf(emb.filter(col("vec_id") % 2 === 0),
            "embedding", k = 16))
        val path = graft.queries.Batch13.freshIdxPath("probe_compact", dir)
        t("persistIvf")(graft.ops.Ann.persistIvf(idx, path))
        t("append 1")(graft.ops.Ann.appendBatchIdempotent(idx,
          emb.filter(col("vec_id") % 4 === 1), "embedding", path, 0L))
        t("append 2")(graft.ops.Ann.appendBatchIdempotent(idx,
          emb.filter(col("vec_id") % 4 === 3), "embedding", path, 1L))
        t("compactIvf")(graft.ops.Ann.compactIvf(spark, path))
        t("loadIvf+count")(graft.ops.Ann.loadIvf(spark, path).assigned.count())
      case "sem" =>
        t("fit_semantic_dedup (semanticDedup flat)")(
          graft.queries.Batch10.touchMemos(spark, dir))
      case "cc" =>
        val thunks = graft.queries.Batch3.fitThunks(spark, dir).toMap
        t("fit_pair_counts")(thunks("fit_pair_counts")())
        t("fit_cluster_labels (CC fixpoint)")(thunks("fit_cluster_labels")())
    }
    spark.stop()
  }
}
