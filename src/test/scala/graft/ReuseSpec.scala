package graft.queries

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.storage.StorageLevel

import graft.SparkTestBase

/** Executor-loss safety of the shared-subtree reuse layer (round-12
  * hardening, VERDICT r11 finding 1).
  *
  * `localCheckpoint` truncated lineage and stored blocks unreplicated
  * on executors — lose one executor on a real cluster and every
  * consumer of the subtree dies with no recompute path. [[Reuse.cache]]
  * must therefore (a) persist at MEMORY_AND_DISK, (b) RETAIN lineage
  * down to the file-source leaves so lost blocks are recomputed from
  * source, and (c) actually produce the same rows after a total block
  * loss (simulated here with a blocking unpersist mid-lifecycle —
  * the strongest local stand-in for "every executor holding blocks
  * was preempted"). The CC fixpoint instead cuts lineage on purpose,
  * so it must do it with a RELIABLE checkpoint (files on the
  * checkpoint FS), never executor-local blocks. */
class ReuseSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("Reuse.cache persists at MEMORY_AND_DISK (spill, don't drop)") {
    val df = Reuse.cache(spark.range(100).toDF("n"))
    try assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    finally df.unpersist(true)
  }

  test("pairCounts memo: lineage retained to the parquet leaves, rows survive total block loss") {
    val pc = Batch3.pairCounts(spark, dir)
    val first = pc.count() // materialize the cached blocks
    assert(first > 0)
    // (b) the analyzed plan must still reach the file-source relation —
    // a LogicalRDD leaf here would mean a scan barrier (localCheckpoint
    // regression) with nothing to recompute from
    val leaves = pc.queryExecution.analyzed.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall {
      case _: LogicalRelation => true
      case l => !l.isInstanceOf[LogicalRDD]
    }, leaves.map(_.getClass.getName))
    // (c) drop EVERY cached block (pairCounts persists through
    // cacheFresh, so the site hook is the real release path); the
    // count must be recomputed from source, not fail on missing blocks
    Reuse.unpersistSite("batch3.pairCounts")
    Reuse.unpersistSite("batch3.minePairCounts.inv")
    assert(pc.count() == first)
  }

  test("cacheFresh: a rebuild never hits the previous build's cache (stale-fixture defense)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("freshfx").toString
    Seq(1L, 2L, 3L).toDF("n").write.mode("overwrite").parquet(dir)
    def build() = Reuse.cacheFresh("reusespec.fresh",
      spark.read.parquet(dir).groupBy().count())
    val a = build()
    assert(a.collect()(0).getLong(0) === 3L)
    // rewrite the fixture IN PLACE (same path — the canonical-plan
    // trap: a bare persist would serve the 3-row blocks forever)
    Seq(1L, 2L, 3L, 4L, 5L).toDF("n").write.mode("overwrite").parquet(dir)
    val b = build()
    assert(b.collect()(0).getLong(0) === 5L,
      "second build served the first build's cached blocks")
    // and the two builds' plans are NOT cache-interchangeable
    assert(!b.queryExecution.optimizedPlan.sameResult(a.queryExecution.optimizedPlan))
    Reuse.unpersistSite("reusespec.fresh")
  }

  test("cluster fixpoint: reliable checkpoint files on the checkpoint FS, not executor blocks") {
    Batch3.clusterLabels(spark, dir).count()
    val ckptDir = spark.sparkContext.getCheckpointDir
    assert(ckptDir.isDefined, "CC fixpoint ran without a reliable checkpoint dir")
    val root = new java.io.File(new java.net.URI(ckptDir.get).getPath)
    def rddDirs(f: java.io.File): Array[java.io.File] =
      Option(f.listFiles()).getOrElse(Array.empty)
        .flatMap(c => if (c.getName.startsWith("rdd-")) Array(c) else rddDirs(c))
    assert(rddDirs(root).nonEmpty,
      s"no rdd-* checkpoint data under $root — fixpoint rounds did not checkpoint reliably")
  }

  test("cluster fixpoint result is identical after simulated recovery (rebuild from scratch)") {
    val a = Batch3.clusterLabels(spark, dir).orderBy("doc_id").collect()
    // force a rebuild through the memo (fingerprint TTL bypass) on a
    // fresh session: a recovery scenario where the prior JVM's blocks
    // and checkpoints are gone entirely
    val s2 = spark.newSession()
    val b = Batch3.clusterLabels(s2, dir).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }
}
