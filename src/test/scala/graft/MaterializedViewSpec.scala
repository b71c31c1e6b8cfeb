package graft

import java.nio.file.Files

import graft.pipeline.MaterializedViews

/** Materialized views: create stores + registers, queries read the
  * STORED copy (not the live source), refresh swaps in current data,
  * drop deregisters. */
class MaterializedViewSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graftmv").toString

  test("create / query / refresh / drop lifecycle") {
    val mvs = new MaterializedViews(spark, tmp())
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")
      .createOrReplaceTempView("mv_src")
    mvs.create("mv_counts",
      "SELECT tag, count(*) AS n FROM mv_src GROUP BY tag")
    def counts = spark.sql("SELECT * FROM mv_counts ORDER BY tag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(counts === Seq(("a", 2L), ("b", 1L)))

    // the view reads the STORED copy: changing the source does NOT
    // change the view until refresh
    Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("id", "tag").createOrReplaceTempView("mv_src")
    assert(counts === Seq(("a", 2L), ("b", 1L)))
    mvs.refresh("mv_counts")
    assert(counts === Seq(("a", 2L), ("b", 3L)))
    assert(mvs.list("mv_counts")._2 === 1) // version bumped

    // stored-scan plan: the view reads parquet, not the defining agg
    val plan = spark.sql("SELECT * FROM mv_counts").queryExecution
      .executedPlan.toString
    assert(plan.contains("parquet"), plan.take(1500))

    assert(mvs.drop("mv_counts"))
    assert(!mvs.drop("mv_counts"))
    intercept[Exception] { spark.sql("SELECT * FROM mv_counts").collect() }
    intercept[NoSuchElementException] { mvs.refresh("mv_counts") }
  }

  test("create replaces an existing view definition") {
    val mvs = new MaterializedViews(spark, tmp())
    spark.range(5).createOrReplaceTempView("mv_src2")
    mvs.create("mv_v", "SELECT count(*) AS n FROM mv_src2")
    assert(spark.table("mv_v").head().getLong(0) === 5L)
    mvs.create("mv_v", "SELECT max(id) AS n FROM mv_src2")
    assert(spark.table("mv_v").head().getLong(0) === 4L)
    assert(mvs.list("mv_v")._2 === 1) // replacement is a new version
    intercept[IllegalArgumentException] { mvs.create("bad name!", "SELECT 1") }
  }
}
