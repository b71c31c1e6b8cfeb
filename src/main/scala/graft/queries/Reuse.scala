package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Cluster-safe reuse primitives for expensive shared subtrees (the
  * near-dup pair graph, minhash signatures, IVF assignments, the CC
  * fixpoint rounds).
  *
  * Until round 11 these subtrees were reused via
  * `localCheckpoint(false)`. That truncates lineage AND stores the
  * blocks unreplicated on executors: on a real cluster a single lost
  * executor (preemption, OOM-kill, dynamic deallocation — the Spark
  * docs warn about exactly this) fails every consumer of the subtree
  * with no recompute path. Invisible at local[32]; the top remaining
  * scale risk at 1000 executors. Round-12 hardening replaces it with
  * two primitives, chosen by whether the lineage must actually be cut:
  *
  *  - [[cache]]: `persist(MEMORY_AND_DISK)` — the same lazy
  *    materialize-once reuse, but lineage is RETAINED, so a block lost
  *    with its executor is recomputed from source instead of killing
  *    the query. MEMORY_AND_DISK (not MEMORY_ONLY) so an executor
  *    under memory pressure spills rather than silently dropping
  *    blocks and re-running the Σdf² mining join per consumer.
  *  - [[checkpointReliable]]: eager `Dataset.checkpoint()` to a real
  *    filesystem for ITERATIVE loops whose plan would otherwise grow
  *    per round (the connected-components fixpoint). Unlike
  *    localCheckpoint the files live on replicated storage — locally a
  *    scratch dir wiped on JVM exit; on a cluster the durable path the
  *    deployment sets via `-D`[[checkpointDirProp]] (HDFS/S3), which
  *    survives any executor loss.
  *
  * Checkpoint files of superseded fixpoint rounds accumulate until JVM
  * exit (Spark only reclaims them under
  * `spark.cleaner.referenceTracking.cleanCheckpoints`, a
  * startup-time conf): bounded at ~maxRounds × |labels| of id-pair
  * rows in scratch, and the label table is ids-only — acceptable
  * against the alternative of an unrecoverable 50-round lineage. */
object Reuse {

  /** System property a deployment sets to point reliable checkpoints
    * at durable storage (e.g. an HDFS/S3 path). Defaults to a per-JVM
    * temp scratch dir registered for deletion on exit. */
  val checkpointDirProp = "graft.checkpoint.dir"

  /** Lazy, lineage-retaining reuse of a shared subtree. */
  def cache(df: DataFrame): DataFrame =
    df.persist(StorageLevel.MEMORY_AND_DISK)

  /** [[cache]] for typed Datasets. */
  def cacheDs[T](ds: Dataset[T]): Dataset[T] =
    ds.persist(StorageLevel.MEMORY_AND_DISK)

  /** Eager reliable checkpoint: cuts lineage by writing to the
    * checkpoint filesystem (NOT executor-local blocks). */
  def checkpointReliable(df: DataFrame): DataFrame = {
    ensureCheckpointDir(df.sparkSession)
    df.checkpoint()
  }

  /** Idempotently give the SparkContext a checkpoint dir: the
    * `-D`[[checkpointDirProp]] override if set, else a fresh temp
    * scratch dir (deleted on JVM exit). A dir already set on the
    * context (e.g. by the hosting application) is respected. */
  def ensureCheckpointDir(s: SparkSession): Unit = synchronized {
    val sc = s.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val root = sys.props.get(checkpointDirProp).getOrElse {
        val p = java.nio.file.Files.createTempDirectory("graft_ckpt_")
        deleteOnExit(p)
        p.toString
      }
      sc.setCheckpointDir(root)
    }
  }

  /** Recursive delete-on-exit for scratch trees (deepest-first). */
  def deleteOnExit(p: java.nio.file.Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        val walk = java.nio.file.Files.walk(p)
        try
          walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        finally walk.close()
      } catch { case _: Exception => () }
    }))
}
