package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GraftOptimizations

/** WindowTopKRewrite: `Filter(row_number() <= k)` over a Window becomes
  * a RowTopK aggregate + posexplode, result-identical under a total
  * order, guarded against every unsafe shape. */
class TopKRewriteSpec extends SparkTestBase {

  // A second session sharing the context, with the optimizer rule
  // injected — mirrors ExtensionsSpec's builder dance.
  private lazy val opt: SparkSession = {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-topk-rewrite")
      .withExtensions(new GraftOptimizations())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prev.foreach { p =>
      SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
    }
    s
  }

  /** (user, score, id) rows with ties in score and several groups. */
  private def fixture(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until 200).map { i =>
      (s"u${i % 7}", (i * 31 % 13).toDouble, i.toLong, s"p$i")
    }.toDF("user", "score", "id", "payload")
  }

  private def topk(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user"))
      .orderBy(col("score").desc, col("id")) // total order: ids unique
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def collectSorted(df: DataFrame): Seq[(String, Double, Long, String, Int)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
      r.getString(3), r.getInt(4))).toSeq.sorted

  test("rewrite fires: no Window in the optimized plan, RowTopK aggregate instead") {
    val df = topk(fixture(opt), 3)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.toLowerCase.contains("row_top_k"), plan.take(2000))
    // and the physical plan aggregates with a partial (map-side) pass
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("ObjectHashAggregate") || phys.contains("SortAggregate"),
      phys.take(2000))
  }

  test("rewrite is result-identical to the window plan (total order)") {
    for (k <- Seq(1, 3, 29, 200)) { // k > group size exercises short groups
      val got = collectSorted(topk(fixture(opt), k))
      val want = collectSorted(topk(fixture(spark), k))
      assert(got === want, s"k=$k")
    }
  }

  test("extra filter conjuncts not referencing rn survive on top") {
    val df = fixture(opt)
    val w = Window.partitionBy(col("user")).orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("id") % 2 === 0)
    assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
    val want = fixture(spark).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("id") % 2 === 0)
    assert(collectSorted(q) === collectSorted(want))
  }

  test("rn = 1 (latest-per-key shape) rewrites") {
    val df = fixture(opt)
    val w = Window.partitionBy(col("user")).orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
    assert(q.count() === 7) // one row per group
  }

  test("guards: rank(), rn used beyond the bound, huge k all keep the Window") {
    val df = fixture(opt)
    val w = Window.partitionBy(col("user")).orderBy(col("score").desc, col("id"))
    // rank() is not row_number — no rewrite
    val rankQ = df.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(rankQ.queryExecution.optimizedPlan.toString.contains("Window"))
    // a conjunct referencing rn beyond the bound — no rewrite
    val refQ = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("rn") % 2 === 1)
    assert(refQ.queryExecution.optimizedPlan.toString.contains("Window"))
    // k past the in-memory cap — no rewrite
    val bigQ = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 100000)
    assert(bigQ.queryExecution.optimizedPlan.toString.contains("Window"))
    // and the guarded plans still answer correctly
    assert(rankQ.count() > 0 && refQ.count() > 0 && bigQ.count() === 200)
  }

  test("guard: rn < Int.MinValue keeps the Window (v - 1 must not wrap into a bound)") {
    // `rn < Int.MinValue` is unsatisfiable — the original plan returns
    // zero rows. A wrapping v - 1 would classify it as bound
    // Int.MaxValue, DROP the conjunct, and emit top-5 rows per group.
    val df = fixture(opt)
    val w = Window.partitionBy(col("user")).orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") < Int.MinValue && col("rn") <= 5)
    assert(q.queryExecution.optimizedPlan.toString.contains("Window") ||
      q.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      q.queryExecution.optimizedPlan.toString.take(2000))
    assert(q.count() === 0)
    // the mirrored literal-on-the-left spelling wraps the same way
    val q2 = df.withColumn("rn", row_number().over(w))
      .filter(lit(Int.MinValue) > col("rn") && col("rn") <= 5)
    assert(q2.count() === 0)
  }

  test("RowTopK executes as partial+final ObjectHashAggregate (map-side combine)") {
    // the whole point of the rewrite is O(groups·k) rows through the
    // shuffle — that requires a PARTIAL ObjectHashAggregate before the
    // exchange; a regression to sort-based or final-only aggregation
    // must fail loudly here
    val df = topk(fixture(opt), 3)
    df.write.format("noop").mode("overwrite").save() // settle AQE
    val phys = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(phys).size >= 2, phys.take(3000))
    assert(phys.contains("partial_row_top_k"), phys.take(3000))
    assert(!phys.contains("SortAggregate"), phys.take(3000))
  }

  test("rewrite fires through an intervening Project (withColumn.select.filter)") {
    // the shape ann_knn_join produces: a select between the window
    // column and the bound filter → Filter(Project(Window))
    val w = Window.partitionBy(col("user")).orderBy(col("score").desc, col("id"))
    def q(s: SparkSession) = fixture(s)
      .withColumn("rn", row_number().over(w))
      .select(col("user"), col("id"), col("rn"), (col("score") * 2).as("score2"))
      .filter(col("rn") <= 2)
    val plan = q(opt).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.toLowerCase.contains("row_top_k"), plan.take(2000))
    val got = q(opt).collect().map(_.toString).sorted
    val want = q(spark).collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("through-Project rewrite keeps non-rn conjuncts and rn aliases") {
    val w = Window.partitionBy(col("user")).orderBy(col("score").desc, col("id"))
    def q(s: SparkSession) = fixture(s)
      .withColumn("rn", row_number().over(w))
      .select(col("user"), col("id"), col("rn").as("rank_out"))
      .filter(col("rank_out") <= 2 && col("id") % 2 === 0)
    val plan = q(opt).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    val got = q(opt).collect().map(_.toString).sorted
    val want = q(spark).collect().map(_.toString).sorted
    assert(got.sameElements(want))
  }

  test("rewrite fires from the pure-SQL top-N-per-group idiom") {
    fixture(opt).createOrReplaceTempView("topk_sql_fixture")
    val q = opt.sql(
      """SELECT user, id, rn FROM (
        |  SELECT user, id,
        |    row_number() OVER (PARTITION BY user ORDER BY score DESC, id) AS rn
        |  FROM topk_sql_fixture) WHERE rn <= 2""".stripMargin)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.toLowerCase.contains("row_top_k"), plan.take(2000))
    fixture(spark).createOrReplaceTempView("topk_sql_plain")
    val want = spark.sql(
      """SELECT user, id, rn FROM (
        |  SELECT user, id,
        |    row_number() OVER (PARTITION BY user ORDER BY score DESC, id) AS rn
        |  FROM topk_sql_plain) WHERE rn <= 2""".stripMargin)
    assert(q.collect().map(_.toString).sorted
      .sameElements(want.collect().map(_.toString).sorted))
  }

  test("ann_knn_join rewrites: RowTopK aggregate, no per-qid window sort") {
    val df = SparkEntry.queries("ann_knn_join")(opt, sf("sf0.001"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.toLowerCase.contains("row_top_k"), plan.take(2000))
    val got = df.collect().map(_.toString).sorted
    val want = SparkEntry.queries("ann_knn_join")(spark, sf("sf0.001"))
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("rewrite matches the catalog's win_topk_per_day shape on real fixtures") {
    // same semantics as the catalog query, run through the rewrite
    // session vs the plain session
    val plainRows = SparkEntry.queries("win_topk_per_day")(spark, sf("sf0.001"))
      .collect().map(_.toString).sorted
    val optRows = SparkEntry.queries("win_topk_per_day")(opt, sf("sf0.001"))
      .collect().map(_.toString).sorted
    assert(plainRows.nonEmpty && optRows.sameElements(plainRows))
  }
}
