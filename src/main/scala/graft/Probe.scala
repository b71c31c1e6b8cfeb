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
      import org.apache.spark.metrics.source.CodegenMetrics._
      val c0 = METRIC_COMPILATION_TIME.getCount
      val s0 = METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      val c1 = METRIC_COMPILATION_TIME.getCount
      val s1 = METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      System.err.println(
        f"[probe] $label $dt%.2f s  (codegen: ${c1 - c0} compiles, ~${(s1 - s0)}%d ms)")
      r
    }
    // per-job wall/task timing: where do multi-exchange plans spend it?
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(e.jobId)
          if (t0 != 0L)
            System.err.println(
              f"[job] ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.3f s")
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for (a <- si.completionTime; b <- si.submissionTime)
            yield (a - b) / 1e3).getOrElse(-1.0)
          System.err.println(
            f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d wall=$wall%6.3f s  ${si.name.take(60)}")
        }
      })
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
      case "spread" =>
        // A/B: heavy per-row HOF kernels on the 1-partition fixture scan
        // vs hash-spread over the session's cores (guide §2.5 input skew)
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val docs0 = graft.queries.Catalog.table(spark, dir, "documents")
        val sig0 = docs0
          .select(col("doc_id"), graft.queries.Batch3.shingles(col("text"), 3).as("sh"))
          .withColumn("n_sh", size(col("sh")))
          .withColumn("sig", graft.functions.minhash_sig(col("sh"), 128))
        t("sig plain (1-partition)")(noop(sig0))
        t("sig plain again")(noop(sig0))
        val docsR = docs0.repartition(cpus.toInt, col("doc_id"))
        val sigR = docsR
          .select(col("doc_id"), graft.queries.Batch3.shingles(col("text"), 3).as("sh"))
          .withColumn("n_sh", size(col("sh")))
          .withColumn("sig", graft.functions.minhash_sig(col("sh"), 128))
        t("sig spread (repartition 32 by doc_id)")(noop(sigR))
        t("sig spread again")(noop(sigR))
        val sh0 = docs0
          .select(col("doc_id"), graft.queries.Batch3.shingles(col("text"), 3).as("sh"))
        t("shingles plain")(noop(sh0))
        val shR = docsR
          .select(col("doc_id"), graft.queries.Batch3.shingles(col("text"), 3).as("sh"))
        t("shingles spread")(noop(shR))
      case "stream" =>
        def run(name: String): Unit =
          t(name)(SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save())
        run("kmv_stream_multi")
        run("kmv_stream_multi")
        run("dedup_incremental_stream")
        run("dedup_incremental_stream")
      case "pc2" =>
        // candidate minePairCounts shape: scan spread over cores before
        // the HOFs/cache + sizes derived from the cached inv (no second
        // scan+HOF subtree) — vs the current shape
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        t("A current minePairCounts")(noop(
          graft.queries.Batch3.minePairCounts(spark, dir)))
        t("A current again")(noop(
          graft.queries.Batch3.minePairCounts(spark, dir)))
        def mineB(): org.apache.spark.sql.DataFrame = {
          val docs = graft.queries.Catalog.table(spark, dir, "documents")
            .repartition(cpus.toInt, col("doc_id"))
            .select(col("doc_id"), graft.queries.Batch3.shingles(col("text"), 3).as("sh"))
          val invAll = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
            .select(col("doc_id"), xxhash64(col("shingle")).as("shash"))
            .transform(graft.queries.Reuse.cacheFresh("probe.pc2.inv", _))
          val sizes = invAll.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
          graft.ops.Scale.blockedSelfJoinPairs(
              invAll.select("doc_id", "shash"), "shash", "doc_id")
            .select(col("doc_id_a").as("doc_a"), col("doc_id_b").as("doc_b"))
            .groupBy(col("doc_a"), col("doc_b"))
            .agg(count(lit(1)).as("inter"))
            .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
            .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
        }
        t("B spread+inv-sizes")(noop(mineB()))
        t("B again")(noop(mineB()))
        t("B again2")(noop(mineB()))
        t("A current again2")(noop(
          graft.queries.Batch3.minePairCounts(spark, dir)))
      case "pc" =>
        // component breakdown of the Σdf² miner (fit_pair_counts /
        // dedup_ngram_jaccard shape) — where does the 5 s actually go?
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val docs = graft.queries.Batch3.shingleDocs(spark, dir)
        t("1 shingleDocs (HOF + n_sh)")(noop(docs))
        t("1b shingleDocs again (warm)")(noop(docs))
        val inv = graft.queries.Batch3.shingleInv(docs, None)
        t("2 inv build+cache (explode+xxhash64)")(noop(inv))
        t("2b inv re-read (cached)")(noop(inv))
        val hot = inv.groupBy(col("shash")).agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > 1024)
        t("3 hot agg (groupBy shash, filter > cap)")(noop(hot))
        val repl = graft.ops.Scale.triangleReplicate(inv, "shash", "doc_id",
          1024, 64)
        t("4 triangleReplicate (left join + explode)")(noop(repl))
        val pairs = graft.ops.Scale.blockedSelfJoinPairs(
            inv.select("doc_id", "shash"), "shash", "doc_id")
          .select(col("doc_id_a").as("doc_a"), col("doc_id_b").as("doc_b"))
        t("5 self-join pairs")(noop(pairs))
        val agg = pairs.groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("inter"))
        t("6 pair agg")(noop(agg))
        t("7 full minePairCounts")(noop(
          graft.queries.Batch3.minePairCounts(spark, dir)))
        t("7b full minePairCounts again")(noop(
          graft.queries.Batch3.minePairCounts(spark, dir)))
    }
    spark.stop()
  }
}
