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
