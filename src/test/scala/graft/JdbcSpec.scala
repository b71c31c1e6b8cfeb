package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.EndpointConfig
import graft.sinks.Sinks
import graft.sources.Sources

/** K6/S6 jdbc endpoints against embedded Derby (the only JDBC engine in
  * /opt/spark/jars) — batch roundtrip through the registry factories,
  * partitioned parallel read, and the streaming foreachBatch append. */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/dev/null")

  private def memUrl(name: String) = s"jdbc:derby:memory:$name;create=true"

  test("jdbc sink then source roundtrip via registry factories (K6/S6)") {
    val url = memUrl("spec_rt")
    val df = Seq((1, "alpha", 3.5), (2, "beta", -1.0), (3, "gamma", 0.0))
      .toDF("id", "name", "score")
    val w = EndpointConfig("w", "jdbc", key = "k1",
      config = Map("url" -> url, "dbtable" -> "t_rt", "mode" -> "overwrite"))
    Sinks.batch("jdbc")(df, w)
    val r = EndpointConfig("r", "jdbc", key = "k1",
      config = Map("url" -> url, "dbtable" -> "t_rt"))
    val back = Sources.resolveBatch(r)(spark, r)
      .select($"id", $"name", $"score").orderBy("id")
    assert(back.as[(Int, String, Double)].collect().toSeq ===
      Seq((1, "alpha", 3.5), (2, "beta", -1.0), (3, "gamma", 0.0)))
  }

  test("jdbc source splits into parallel range partitions") {
    val url = memUrl("spec_part")
    val df = (0 until 100).map(i => (i, s"row$i")).toDF("id", "payload")
    Sinks.batch("jdbc")(df, EndpointConfig("w", "jdbc", key = "k2",
      config = Map("url" -> url, "dbtable" -> "t_part", "mode" -> "overwrite")))
    val r = EndpointConfig("r", "jdbc", key = "k2",
      config = Map("url" -> url, "dbtable" -> "t_part",
        "partition_column" -> "id", "lower_bound" -> "0",
        "upper_bound" -> "100", "num_partitions" -> "4"))
    val back = Sources.resolveBatch(r)(spark, r)
    assert(back.rdd.getNumPartitions === 4) // N concurrent range queries
    assert(back.count() === 100)
  }

  test("jdbc streaming sink appends each micro-batch (overwrite=false path)") {
    val url = memUrl("spec_stream")
    val dir = Files.createTempDirectory("graftjdbc").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.jsonl"),
      java.util.List.of("""{"k":"a"}""", """{"k":"b"}"""))
    val src = spark.readStream.text(dir).withColumnRenamed("value", "payload")
    val c = EndpointConfig("s", "jdbc", key = "k3",
      config = Map("url" -> url, "dbtable" -> "t_stream",
        "checkpoint" -> (dir + "/ck")))
    val q = Sinks.configureStream(src, c).start()
    q.processAllAvailable(); q.stop()
    val back = Sources.resolveBatch(c)(spark, c)
    assert(back.as[String].collect().toSet ===
      Set("""{"k":"a"}""", """{"k":"b"}"""))
  }

  test("missing url/dbtable fail with a clear config error") {
    val c = EndpointConfig("bad", "jdbc", key = "k4", config = Map("dbtable" -> "t"))
    val e = intercept[RuntimeException](
      Sources.resolveBatch(c)(spark, c))
    assert(e.getMessage.contains("missing 'url'"))
    val e2 = intercept[RuntimeException](
      Sinks.batch("jdbc")(Seq(1).toDF("i"),
        EndpointConfig("bad2", "jdbc", key = "k5", config = Map("url" -> "jdbc:derby:memory:x"))))
    assert(e2.getMessage.contains("missing 'dbtable'"))
  }
}
