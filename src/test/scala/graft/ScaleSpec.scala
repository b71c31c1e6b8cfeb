package graft

import org.apache.spark.sql.functions._

import graft.ops.Scale

class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("salted two-phase aggregation equals direct aggregation exactly") {
    // heavily skewed: one hot key with ~90% of rows
    val df = ((1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Scale.saltedSumCount(df, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet === direct.keySet)
    // counts exact; sums equal (integral doubles sum associatively here)
    salted.foreach { case (k, (s, n)) =>
      assert(n === direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
  }

  test("salted join equals plain inner join") {
    val big = ((1 to 5000).map(_ => "hot") ++ (1 to 500).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "row_id")
    val small = (Seq("hot") ++ (1 to 500).map(i => s"k$i")).zipWithIndex
      .toDF("k", "dim_id")
    val plain = big.join(small, "k").count()
    val salted = Scale.saltedJoin(big, small, "k", buckets = 8).count()
    assert(salted === plain)
  }

  test("bucketed tables join with zero exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      Scale.writeBucketed(li.withColumnRenamed("l_orderkey", "k"), "k", 4, "li_bkt")
      Scale.writeBucketed(ord.withColumnRenamed("o_orderkey", "k"), "k", 4, "ord_bkt")
      val joined = spark.table("li_bkt").join(spark.table("ord_bkt"), "k")
      joined.count() // force final plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
