package graft.pipeline

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized views — the last roadmap-plane feature
  * (`/root/reference/ROADMAP.md:95-106` plans "SQL interface ...
  * materialized views"; no code exists in the reference). Spark-first
  * shape: the view's SQL runs once, lands as parquet, and registers as
  * a temp view over the STORED data, so downstream queries scan
  * columnar storage (with pushdown/pruning) instead of re-running the
  * defining query.
  *
  * Refresh writes a NEW versioned subdirectory and re-registers the
  * view afterwards — readers holding the previous DataFrame keep a
  * consistent snapshot (their file listing points at v{n-1}, which is
  * never mutated), the swap is the metadata re-registration. At scale
  * the same layout supports `partitionBy` on the write and incremental
  * refresh via `foreachBatch` upserts; this facade keeps the
  * transactional full-refresh contract.
  */
final class MaterializedViews(spark: SparkSession, baseDir: String) {

  private final case class Mv(sql: String, version: Int)
  private val views = TrieMap.empty[String, Mv]

  private def path(name: String, version: Int) = s"$baseDir/$name/v$version"

  private def nameOk(name: String): Boolean = name.matches("[A-Za-z0-9_]+")

  /** Create (or replace) a materialized view: run `sql`, store the
    * result, register `name` over the stored copy. */
  def create(name: String, sql: String): Unit = {
    require(nameOk(name), s"invalid view name: $name")
    val version = views.get(name).map(_.version + 1).getOrElse(0)
    spark.sql(sql).write.mode("overwrite").parquet(path(name, version))
    spark.read.parquet(path(name, version)).createOrReplaceTempView(name)
    views(name) = Mv(sql, version)
  }

  /** Re-run the defining query against current source data into a new
    * version and swap the registration. */
  def refresh(name: String): Unit = {
    val mv = views.getOrElse(name,
      throw new NoSuchElementException(s"no materialized view: $name"))
    val next = mv.version + 1
    spark.sql(mv.sql).write.mode("overwrite").parquet(path(name, next))
    spark.read.parquet(path(name, next)).createOrReplaceTempView(name)
    views(name) = Mv(mv.sql, next)
  }

  /** Drop the registration (stored versions stay on disk for readers;
    * storage GC is the caller's policy). */
  def drop(name: String): Boolean = {
    val existed = views.remove(name).isDefined
    if (existed) spark.catalog.dropTempView(name)
    existed
  }

  /** Registered views with their defining SQL and current version. */
  def list: Map[String, (String, Int)] =
    views.readOnlySnapshot().toMap.map { case (n, mv) => n -> ((mv.sql, mv.version)) }

  /** The stored data of a view (what SQL over `name` reads). */
  def table(name: String): DataFrame = spark.table(name)
}
