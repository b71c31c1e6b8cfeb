package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters.heavy_hitters

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("exact when k >= distinct items, across partitions") {
    val df = ((1 to 500).map(_ => "a") ++ (1 to 300).map(_ => "b") ++
      (1 to 7).map(_ => "c")).toDF("t").repartition(8)
    val got = df.agg(heavy_hitters($"t", 16).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 500L, "b" -> 300L, "c" -> 7L))
  }

  test("Misra-Gries bound holds under pressure (k < distinct)") {
    val n = 10000
    val hot = (1 to n / 2).map(_ => "HOT")
    val noise = (1 to n / 2).map(i => s"x${i % 500}")
    val df = (hot ++ noise).toDF("t").repartition(8)
    val got = df.agg(heavy_hitters($"t", 9).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // any item above n/(k+1) = 1000 must survive; HOT has 5000
    assert(got.contains("HOT"))
    val c = got("HOT")
    assert(c <= 5000L)
    assert(c >= 5000L - n / 10) // true - n/(k+1) lower bound
    assert(got.size <= 9)
  }

  test("null inputs are skipped") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("t")
    val got = df.agg(heavy_hitters($"t", 4).as("hh"))
      .select(explode($"hh").as("e")).select($"e.count").as[Long].head()
    assert(got === 2L)
  }
}
