package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the custom
  * functions in plain SQL with no programmatic registration. */
class ExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects the graft functions at session-builder time") {
    // The string conf `spark.sql.extensions=graft.GraftExtensions` is
    // read from the SPARKCONTEXT conf at session construction — with
    // the suite's shared context already running, only
    // builder.withExtensions can attach the injector to a new session.
    // Both paths execute the same GraftExtensions.apply; the
    // conf-string class-loading is Spark's own (upstream-tested)
    // machinery. Clear the active/default slots so the builder
    // constructs a fresh session (reusing the context) instead of
    // returning the live one unchanged.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT fnv64('hello') AS h,
          |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
          |  hamming64(7L, 0L) AS ham,
          |  simhash64(array('a', 'b')) AS sh""".stripMargin).head()
      // fnv64("hello") — published FNV-1a 64 test vector
      assert(r.getLong(0) === 0xa430d84680aabd0bL)
      assert(r.getDouble(1) === 1.0)
      assert(r.getInt(2) === 3)
      assert(r.getLong(3) === graft.functions.HashOps.simHash64(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array(org.apache.spark.unsafe.types.UTF8String.fromString("a"),
            org.apache.spark.unsafe.types.UTF8String.fromString("b")))))

      // parameterized expressions take literal size/seed args in SQL
      val p = s.sql(
        """SELECT size(minhash_sig(array('a','b','c'), 16)) AS sig_len,
          |  rp_bits(array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT)), 8, 42L) AS bits"""
          .stripMargin).head()
      assert(p.getInt(0) === 16)
      assert(p.getLong(1) >= 0L && p.getLong(1) < 256L) // 8 bits
      // non-literal k is a clear resolution-time error, not a crash
      val err = intercept[Exception] {
        s.sql("SELECT minhash_sig(array('a'), CAST(id AS INT)) FROM range(1)")
          .collect()
      }
      assert(err.getMessage.contains("literal") ||
        Option(err.getCause).exists(_.getMessage.contains("literal")))

      // text kernels through pure SQL, including the optional stride
      val ws = s.sql(
        """SELECT word_shingles('a b a b c', 2) AS sh,
          |  word_grams('a b a b c', 2) AS gr,
          |  word_grams('a b c d e f', 2, 2) AS st""".stripMargin).head()
      assert(ws.getSeq[String](0) === Seq("a b", "b a", "b c")) // distinct
      assert(ws.getSeq[String](1) === Seq("a b", "b a", "a b", "b c")) // multiplicity
      assert(ws.getSeq[String](2) === Seq("a b", "c d", "e f")) // stride 2

      // aggregates through pure SQL: heavy_hitters + top_k_by
      s.range(0, 100).selectExpr("id", "CAST(id % 3 AS STRING) AS tok",
        "CAST(id AS DOUBLE) AS v").createOrReplaceTempView("ext_rows")
      val hh = s.sql(
        "SELECT heavy_hitters(tok, 10) AS hh FROM ext_rows").head()
        .getSeq[org.apache.spark.sql.Row](0)
      assert(hh.map(_.getString(0)).toSet === Set("0", "1", "2"))
      assert(hh.map(_.getLong(1)).sum === 100L) // k >= distinct → exact
      val tk = s.sql(
        "SELECT top_k_by(v, id, 3) AS tk FROM ext_rows").head()
        .getSeq[org.apache.spark.sql.Row](0)
      assert(tk.map(_.getLong(0)) === Seq(99L, 98L, 97L)) // best-first
      // and they group correctly (partial agg path)
      val grouped = s.sql(
        """SELECT tok, top_k_by(v, id, 1) AS tk FROM ext_rows
          |GROUP BY tok ORDER BY tok""".stripMargin).collect()
      assert(grouped.map(_.getSeq[org.apache.spark.sql.Row](1).head.getLong(0))
        === Array(99L, 97L, 98L)) // max id per residue class
    } finally { // shared context: do not stop; restore the prior session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
