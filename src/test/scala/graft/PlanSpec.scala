package graft

import graft.queries.Catalog

/** Plan-shape regression spec: the properties that make the headline
  * queries scale — filter pushdown into the parquet scan, column
  * pruning, map-side partial aggregation — asserted on the EXECUTED
  * plan so a refactor that silently loses them fails here, not at
  * 100 TB. */
class PlanSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  private def executed(name: String): String = {
    val df = Catalog.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save() // settle AQE
    df.queryExecution.executedPlan.toString
  }

  test("q1_agg: filter pushed to scan, schema pruned, partial aggregation") {
    val plan = executed("q1_agg")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      plan.take(3000))
    // lineitem is 16 columns wide; the scan must read only the handful used
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      readSchema)
    // partial (map-side) + final aggregate pair
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("q3_topk_join: both dimension filters reach their scans") {
    val plan = executed("q3_topk_join")
    // customer segment filter and order-date filter both pushed
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment")
      || plan.contains("EqualTo(c_mktsegment"), plan.take(3000))
    assert(plan.contains("LessThan(o_orderdate") || plan.contains("o_orderdate"),
      plan.take(3000))
  }

  test("t1_map_project: projection prunes the scan to the selected columns") {
    val plan = executed("t1_map_project")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("props"), readSchema)
  }

  test("dedup_exact: aggregation is partial+final (no naive global shuffle-all)") {
    val plan = executed("dedup_exact")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("ann_topk: top-k is TakeOrdered, not a global sort") {
    val plan = executed("ann_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("GlobalSort"), plan.take(3000))
  }

  test("zscore_by_type: stats join back via broadcast, no state-table shuffle") {
    val plan = executed("zscore_by_type")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("histogram_values + funnel: partial+final aggregation pairs") {
    assert("HashAggregate".r.findAllIn(executed("histogram_values")).size >= 2)
    // funnel: per-user min-struct agg partial-aggregates map-side too
    assert("HashAggregate".r.findAllIn(executed("funnel_click_purchase")).size >= 2)
  }

  test("shingle_cosine_pairs / dedup_edit_distance: equi-joins only, no cartesian") {
    val cos = executed("shingle_cosine_pairs")
    assert(!cos.contains("CartesianProduct") && !cos.contains("BroadcastNestedLoop"),
      cos.take(3000))
    val ed = executed("dedup_edit_distance")
    assert(!ed.contains("CartesianProduct") && !ed.contains("BroadcastNestedLoop"),
      ed.take(3000))
  }

  test("contamination_ngram: eval side broadcast, corpus never shuffle-joined") {
    val plan = executed("contamination_ngram")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the shingle join (train x bench) must not be a shuffled SMJ: the
    // only sort-merge allowed is none — doc_id-keyed joins may appear
    // as broadcast too at this SF, so simply forbid a corpus SMJ on shash
    assert(!plan.contains("SortMergeJoin [shash"), plan.take(3000))
  }

  test("chunk_docs / pii_mask: scans pruned to the consumed columns") {
    val chunk = executed("chunk_docs")
    val rs1 = chunk.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs1.contains("text") && !rs1.contains("lang") && !rs1.contains("source"), rs1)
    val mask = executed("pii_mask")
    val rs2 = mask.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs2.contains("props") && !rs2.contains("user_id"), rs2)
  }

  test("dedup_substring: inverted-index equi-join, no cartesian, partial+final aggs") {
    val plan = executed("dedup_substring")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(3000))
    // window-hash index join + two aggregations, all map-side combinable
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan.take(3000))
  }

  test("q7_volume_shipping: both nation roles broadcast, no cartesian") {
    val plan = executed("q7_volume_shipping")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(3000))
  }

  test("q9_profit: part predicate pushed to scan, dims broadcast, partial agg") {
    val plan = executed("q9_profit")
    // the p_name filter must reach the parquet scan, not sit above it
    assert(plan.contains("StringContains(p_name,a)"), plan.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(3000))
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(3000))
  }

  test("cohort_retention: aggregations partial+final, no window") {
    val plan = executed("cohort_retention")
    assert(!plan.contains("Window"), plan.take(3000))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("dedup_incremental: asymmetric index join, no cartesian, anti-join keeps") {
    val plan = executed("dedup_incremental")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(3000))
    assert(plan.contains("LeftAnti"), plan.take(3000))
  }

  test("rep_signals: both gram aggregations are partial+final") {
    val plan = executed("rep_signals")
    // two 2-level aggregations => at least 4 HashAggregates (partial+final each)
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan.take(3000))
  }

  test("pack_sequences / corpus_budget_take: windows keyed (lang, shard), not bare lang") {
    for (name <- Seq("pack_sequences", "corpus_budget_take")) {
      val df = Catalog.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      // the running-sum window must partition on the hash shard too —
      // a bare (lang) key collapses parallelism to #languages at 100 TB
      val winLine = plan.linesIterator
        .find(_.contains("windowspecdefinition")).getOrElse("")
      assert(winLine.contains("lang") && winLine.contains("shard"),
        s"$name window key not sub-sharded:\n$winLine")
      // and the sharding genuinely splits every language's window input
      // (each fixture language has >= 64 docs across 8 hash shards)
      val shardsPerLang = df.select("lang", "shard").distinct()
        .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1))
      assert(shardsPerLang.nonEmpty && shardsPerLang.forall(_._2 >= 4),
        s"$name shards per lang: ${shardsPerLang.mkString(",")}")
    }
  }

  test("corpus_budget_exact: sharded prune phase + global pass equals the direct window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = Catalog.queries("corpus_budget_exact")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    // two window phases; the pruning one is keyed (lang, shard)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.size >= 2, plan.take(3000))
    assert(winLines.exists(_.contains("shard")), s"no sharded prune window:\n$plan")
    // exactness: identical rows to the naive single global window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = Catalog.table(spark, dir, "documents")
      .withColumn("toks", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum", sum(col("toks")).over(w))
      .filter(col("cum") - col("toks") < 2000L)
      .select(col("lang"), col("doc_id"), col("toks"), col("cum"))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(df) === rows(ref) && rows(ref).nonEmpty)
  }

  test("ann_int8_topk: single scan + TakeOrdered in the quantized domain") {
    val plan = executed("ann_int8_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("ann_ivf_hier_topk: cluster-pruned scan + TakeOrdered, no cartesian") {
    val plan = executed("ann_ivf_hier_topk")
    // the probe prunes on the cluster column and cuts with TakeOrdered
    // — same physical discipline as the flat IVF entry
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(plan.contains("cluster"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dedup_normalized: partial+final aggregation over the normalized hash") {
    val plan = executed("dedup_normalized")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // only doc_id and text feed the hash — props and the rest stay unread
    assert(readSchema.nonEmpty && !readSchema.contains("props"), readSchema)
  }

  test("ann_ivf_knn_join: bounded top-k aggregates partial+final, corpus never cartesian") {
    val plan = executed("ann_ivf_knn_join")
    // both cuts run through the ObjectHashAggregate pair (map-side
    // bounded buffers), and the only cross join is the broadcast
    // center ranking — never the corpus side
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 4, plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
  }

  test("ann_hier_knn_join: one broadcast nested-loop max, both center tables broadcast, three bounded cuts") {
    val df = Catalog.queries("ann_hier_knn_join")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // never a corpus-side cartesian
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
    // the ONLY nested-loop is the |Q| x k1 coarse ranking against the
    // broadcast coarse table; the sub-center and cluster joins are
    // equi-joins (a second nested-loop would mean the corpus side).
    // The partitioned assignment scan carries a DPP subquery that
    // re-prints the whole probe subtree (including this same coarse
    // ranking), so strip the subquery BLOCK (marker line + its deeper-
    // indented body) and count over the REMAINING main tree — a plain
    // split-at-marker would also discard main-tree branches printed
    // after the scan, blinding the count to regressions there.
    val mainTree = stripSubqueryBlocks(plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(mainTree).size <= 1, plan.take(4000))
    // the assignment scan must be dynamically pruned at the directory
    // level — the build-once partitionBy(cluster) layout's whole point
    assert(plan.contains("dynamicpruningexpression"), plan.take(4000))
    // both center tables ship as broadcasts (coarse + flat sub-center)
    assert("BroadcastExchange".r.findAllIn(plan).size >= 2, plan.take(4000))
    // three bounded top-k cuts (coarse cells, sub-clusters, final k-NN),
    // each a partial+final ObjectHashAggregate pair — map-side bounded,
    // ids-only through every exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 6, plan.take(4000))
  }

  /** Remove every `SubqueryAdaptiveBroadcast` block (the marker line
    * plus all deeper-indented lines under it) from an executed-plan
    * string: DPP subqueries re-print the whole probe subtree, so node
    * counts over the raw string double-count the pruned scan's
    * planning subquery. */
  private def stripSubqueryBlocks(plan: String): String = {
    def indentOf(l: String): Int = {
      val i = l.indexOf("+-"); val j = l.indexOf(":-")
      if (i < 0 && j < 0) l.takeWhile(_ == ' ').length
      else if (i < 0) j else if (j < 0) i else math.min(i, j)
    }
    val out = collection.mutable.ArrayBuffer.empty[String]
    var skipIndent = -1
    for (l <- plan.split("\n")) {
      val ind = indentOf(l)
      if (skipIndent >= 0 && ind > skipIndent) () // inside the block
      else if (l.contains("SubqueryAdaptiveBroadcast")) skipIndent = ind
      else { skipIndent = -1; out += l }
    }
    out.mkString("\n")
  }

  test("split_by_cluster: stateless hash past the memoized label subtree, no extra exchange") {
    val df = Catalog.queries("split_by_cluster")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the CC fixpoint is read from its checkpointed subtree — the split
    // itself adds NO aggregation and NO join on top
    assert(!plan.contains("HashAggregate"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    // the only exchange is the catalog contract's final orderBy; the
    // per-row split decision (fnv64 mod 128) must not shuffle anything
    assert("Exchange".r.findAllIn(plan).size <= 1, plan.take(3000))
    // and it genuinely reads the checkpointed label RDD, not a re-mine
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      plan.take(3000))
  }

  test("pipeline_training_corpus: keep-set bloom probed below the first exchange") {
    // the build-once artifact in the composed pipeline: the persisted
    // keep-set bloom must kill dup-loser documents in the scan stage,
    // BEFORE any shuffle — broadcast disabled so every join shuffles
    // and the ordering is unambiguous
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val df = Catalog.queries("pipeline_training_corpus")(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val lines = plan.linesIterator.toSeq
      val probeIdx = lines.indexWhere(_.contains("might_contain"))
      val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
      assert(probeIdx >= 0, s"no bloom probe in plan:\n${plan.take(3000)}")
      assert(exchangeIdx >= 0 && exchangeIdx < probeIdx,
        s"probe not below the exchange (probe@$probeIdx, exchange@$exchangeIdx):\n${plan.take(3000)}")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("corpus_shuffle: pruned scan, one hash exchange for the shard window") {
    val plan = executed("corpus_shuffle").split("== Initial Plan ==").head
    // scan reads only (doc_id, lang) of the documents table
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("lang")
      && !readSchema.contains("text"), readSchema)
    // exactly one hashpartitioning exchange (the shard window); the
    // only other exchange is the gate determinism orderBy's range
    // partitioning, which production callers drop with the orderBy
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      plan.take(3000))
    // SHUFFLE exchanges only: BroadcastExchange/ReusedExchange nodes
    // are not shuffles and must not count toward the budget
    val shuffles = plan.linesIterator.count(l => l.contains("Exchange")
      && !l.contains("BroadcastExchange") && !l.contains("ReusedExchange"))
    assert(shuffles <= 2, s"unexpected extra shuffles:\n${plan.take(3000)}")
  }
}
