package graft

import graft.ops.Profile

/** [[graft.ops.Profile]]: the single-pass dataset profile. Exactness is
  * oracle-proven by the `profile_columns` gate entry; here the SCALE
  * path — approx distincts must keep the pass a plain one-shot
  * aggregation (no Expand multiplying the input) and land within HLL++
  * error of exact. */
class ProfileSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet(sf("sf0.01") + "/documents.parquet")
  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  test("approx profile lands within HLL++ error of the exact profile") {
    def byCol(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toMap
    val ex = byCol(Profile.profile(docs, cols))
    val ap = byCol(Profile.profile(docs, cols, exact = false, rsd = 0.02))
    assert(ex.keySet === ap.keySet)
    cols.foreach { c =>
      val (nnE, dcE, mnE, mxE) = ex(c)
      val (nnA, dcA, mnA, mxA) = ap(c)
      assert(nnA === nnE && mnA === mnE && mxA === mxE)
      assert(math.abs(dcA - dcE).toDouble / math.max(1L, dcE) <= 0.1,
        s"$c: approx distinct $dcA vs exact $dcE")
    }
  }

  test("approx profile plan has no Expand: one-shot agg however many columns") {
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // exact mode pays the multi-distinct Expand; the 100-TB path must not
    assert(planOf(Profile.profile(docs, cols)).contains("Expand"))
    val approxPlan = planOf(Profile.profile(docs, cols, exact = false))
    assert(!approxPlan.contains("Expand"), approxPlan)
  }

  test("profile handles non-identifier column names (no SQL-string injection)") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"), (2L, "y"))
      .toDF("doc-id", "v'al")
    val out = Profile.profile(df, Seq("doc-id", "v'al")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("doc-id") === ((3L, 2L)))
    assert(out("v'al") === ((3L, 2L)))
  }

  test("profile refuses unknown columns loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(docs, Seq("doc_id", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
