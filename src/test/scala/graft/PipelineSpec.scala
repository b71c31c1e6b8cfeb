package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.ConfigParser
import graft.pipeline.Engine
import graft.sinks.EsLikeSink

/** Pipeline assembly + batch dataflow spec (reference C1/C2 +
  * pipeline_test.go's lifecycle cases). */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graftpipe").toString

  test("config: parses the reference's {source, sink} create body (A1)") {
    val spec = ConfigParser.parsePipelineSpec(
      """{"source": {"name": "MongoDb User Data", "type": "mongodb",
        |  "key": "mongo_user_pipeline",
        |  "config": {"uri": "mongodb://x", "load_initial_data": "true"}},
        | "sink": {"name": "File out", "type": "file",
        |  "key": "mongo_user_pipeline", "config": {"file_path": "/tmp/o"}}}""".stripMargin)
    assert(spec.source.connectionType === "mongodb")
    assert(spec.source.config("load_initial_data") === "true")
    assert(spec.sink.config("file_path") === "/tmp/o")
    assert(spec.source.key === spec.sink.key)
  }

  test("config: file-level sources/sinks pair by key (config.go:90-149)") {
    val specs = ConfigParser.parseConfigFile(
      """{"sources": [{"name":"a","type":"file","key":"k1","config":{"path":"/a"}},
        |             {"name":"b","type":"file","key":"k2","config":{"path":"/b"}}],
        | "sinks":   [{"name":"out","type":"file","key":"k1","config":{"file_path":"/o"}}]}"""
        .stripMargin)
    assert(specs.map(_.source.name) === Seq("a")) // k2 has no sink partner
  }

  test("batch pipeline: file source → uppercase transform → NDJSON sink") {
    val in = tmp(); val out = tmp() + "/out"
    // two NDJSON payload lines (the wire Job payload shape)
    Files.write(java.nio.file.Paths.get(in, "data.jsonl"),
      java.util.List.of(
        """{"user":"ada","n":1}""",
        """{"user":"grace","tags":["x","y"]}"""))
    val engine = new Engine(spark)
    engine.runBatch(ConfigParser.parsePipelineSpec(
      s"""{"source": {"name":"in","type":"file","key":"p1",
         |  "config": {"path": "$in", "transforms": "uppercase"}},
         | "sink": {"name":"out","type":"file","key":"p1",
         |  "config": {"file_path": "$out"}}}""".stripMargin))
    val lines = spark.read.text(out).as[String].collect().sorted
    assert(lines.length === 2)
    // sink wraps the payload column as JSON; string values uppercased
    assert(lines.exists(_.contains("ADA")))
    assert(lines.exists(l => l.contains("GRACE") && l.contains("X")))
  }

  test("orc source/sink round-trip through the factories") {
    val dir = tmp() + "/orc"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val cfg = graft.model.EndpointConfig("o", "orc", Map("path" -> dir), "k")
    graft.sinks.Sinks.batch("orc")(df, cfg)
    val back = graft.sources.Sources.resolveBatch(cfg)(spark, cfg)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("invalid source/sink types fail like the reference factory") {
    val engine = new Engine(spark)
    val bad = ConfigParser.parsePipelineSpec(
      """{"source": {"name":"x","type":"mysql","key":"k","config":{}},
        | "sink": {"name":"y","type":"file","key":"k","config":{"file_path":"/o"}}}""".stripMargin)
    val e = intercept[IllegalArgumentException](engine.runBatch(bad))
    assert(e.getMessage.contains("invalid source type")) // config.go:265-267
  }

  test("kafka resolves in both factories; fails cleanly without the kafka jar (S3/S4)") {
    // The sandbox has no spark-sql-kafka jar, so the wiring can only be
    // verified to the plan boundary: "kafka" must be a KNOWN type (the
    // factory resolves it — unlike "mysql" which is rejected as invalid)
    // and materialization must fail with a clear missing-data-source
    // error, not a hang or a misleading config error.
    val cfg = graft.model.EndpointConfig(
      name = "k", connectionType = "kafka", key = "kk",
      config = Map("bootstrap_servers" -> "localhost:9092", "topic" -> "t"))
    val batchSrc = graft.sources.Sources.resolveBatch(cfg)   // no throw
    val streamSrc = graft.sources.Sources.resolveStream(cfg) // no throw
    val eb = intercept[Exception](batchSrc(spark, cfg))
    assert(eb.getMessage.toLowerCase.contains("kafka"))
    val es = intercept[Exception](streamSrc(spark, cfg))
    assert(es.getMessage.toLowerCase.contains("kafka"))
  }

  test("round-robin repartition op (P4) spreads rows evenly, registry-exposed") {
    val df = (0 until 64).toDF("i")
    val rr = graft.ops.Ops.roundRobin(Some(8))(df)
    assert(rr.rdd.getNumPartitions === 8)
    val sizes = rr.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.forall(_ === 8)) // even spread regardless of values
    // config-driven chains can name it
    assert(graft.ops.Ops.chain(Seq("round_robin"))(df).count() === 64)
  }

  test("training-data cleaning ops chain by name through the registry") {
    val df = Seq(
      "call me at 5551234 maybe",              // digits to mask
      "short",                                  // fails quality_filter (<16 chars)
      "a perfectly reasonable training document with enough text",
      "another document with numbers 42 and 7 inside it")
      .toDF("payload")
    val out = graft.ops.Ops.chain(
      Seq("quality_filter", "pii_mask", "token_count"))(df)
    val rows = out.collect().map(r => r.getString(0) -> r.getInt(1))
    assert(rows.length === 3) // "short" cut by the quality filter
    assert(rows.forall { case (p, _) => !p.exists(_.isDigit) }) // masked
    assert(rows.forall { case (p, n) => n === p.split(" ").length })
    // deterministic hash sampling composes too, and keeps a subset
    val sampled = graft.ops.Ops.chain(
      Seq("quality_filter", "hash_sample"))(df).count()
    val again = graft.ops.Ops.chain(
      Seq("quality_filter", "hash_sample"))(df).count()
    assert(sampled === again && sampled <= 3)
  }

  test("es-like sink: upsert by _id is idempotent, latest wins") {
    val index = tmp() + "/index"
    val b1 = Seq("""{"_id":"1","v":"a"}""", """{"_id":"2","v":"b"}""").toDF("payload")
    val b2 = Seq("""{"_id":"2","v":"b2"}""", """{"_id":"3","v":"c"}""").toDF("payload")
    EsLikeSink.upsertBatch(b1, index, "_id")
    EsLikeSink.upsertBatch(b2, index, "_id")
    val docs = spark.read.parquet(index)
      .select(col("__id"), get_json_object(col("payload"), "$.v").as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs === Map("1" -> "a", "2" -> "b2", "3" -> "c"))
  }

  test("es-like sink rewrites only the buckets a batch touches") {
    val index = tmp() + "/bindex"
    val b1 = (0 until 40).map(i => s"""{"_id":"doc$i","v":"a$i"}""").toDF("payload")
    EsLikeSink.upsertBatch(b1, index, "_id")
    def snapshot(): Map[String, Seq[(String, Long, Long)]] =
      new java.io.File(index).listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles().toSeq.sortBy(_.getName)
          .map(f => (f.getName, f.length, f.lastModified))).toMap
    val before = snapshot()
    assert(before.size > 1, "expected ids to spread over multiple buckets")
    // one incoming id → exactly one touched bucket
    val touchedBucket = spark.sql(
      s"SELECT pmod(xxhash64('doc0'), 16)").head().getLong(0).toInt
    EsLikeSink.upsertBatch(
      Seq("""{"_id":"doc0","v":"patched"}""").toDF("payload"), index, "_id")
    val after = snapshot()
    for ((dir, files) <- before if dir != s"__bucket=$touchedBucket")
      assert(after(dir) === files, s"untouched bucket $dir was rewritten")
    assert(after(s"__bucket=$touchedBucket") !== before(s"__bucket=$touchedBucket"))
    // and the content merged correctly
    val docs = spark.read.parquet(index)
      .select(col("__id"), get_json_object(col("payload"), "$.v").as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs("doc0") === "patched" && docs.size === 40)
  }

  test("es-like sink: a corrupt index FAILS the batch instead of erasing it") {
    val index = tmp() + "/cindex"
    EsLikeSink.upsertBatch(
      Seq("""{"_id":"1","v":"keep"}""").toDF("payload"), index, "_id")
    // corrupt the index: truncate every parquet file to garbage
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(index))
      .filter(p => p.toString.endsWith(".parquet")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
    assert(files.nonEmpty)
    files.foreach(p => java.nio.file.Files.write(p, "not parquet".getBytes))
    val before = files.map(p => p -> java.nio.file.Files.readAllBytes(p).toSeq).toMap
    intercept[Exception] {
      EsLikeSink.upsertBatch(
        Seq("""{"_id":"1","v":"clobber"}""").toDF("payload"), index, "_id")
    }
    // the batch failed BEFORE the swap: nothing was deleted or replaced
    for ((p, bytes) <- before)
      assert(java.nio.file.Files.readAllBytes(p).toSeq === bytes,
        s"corrupt index file $p was modified by a failed batch")
    // a genuinely-absent path still reads as an empty index
    val fresh = tmp() + "/fresh"
    EsLikeSink.upsertBatch(Seq("""{"_id":"9","v":"x"}""").toDF("payload"), fresh, "_id")
    assert(spark.read.parquet(fresh).count() === 1)
  }

  test("s3 sink: config maps to s3a path + per-bucket hadoop conf (dry; no jar in env)") {
    val c = graft.model.EndpointConfig("s3out", "s3", key = "s3k",
      config = Map("bucket" -> "corpus", "prefix" -> "v2/docs",
        "endpoint" -> "http://minio.local:9000", "access_key" -> "ak",
        "secret_key" -> "sk", "path_style" -> "true", "format" -> "parquet"))
    val (dest, conf, fmt) = graft.sinks.Sinks.s3WritePlan(c)
    assert(dest === "s3a://corpus/v2/docs")
    assert(fmt === "parquet")
    assert(conf === Map(
      "fs.s3a.bucket.corpus.endpoint" -> "http://minio.local:9000",
      "fs.s3a.bucket.corpus.access.key" -> "ak",
      "fs.s3a.bucket.corpus.secret.key" -> "sk",
      "fs.s3a.bucket.corpus.path.style.access" -> "true"))
    // registered in the factory; executing without hadoop-aws fails
    // with Hadoop's own missing-filesystem error, not a graft bug
    val e = intercept[Exception] {
      graft.sinks.Sinks.batch("s3")(Seq(1).toDF("i"),
        graft.model.EndpointConfig("s", "s3", key = "k",
          config = Map("bucket" -> "nope")))
    }
    assert(Option(e.getMessage).exists(m =>
      m.contains("s3a") || m.contains("S3A") || m.contains("FileSystem")))
    // missing bucket is a clear config error
    val m = intercept[RuntimeException] {
      graft.sinks.Sinks.s3WritePlan(graft.model.EndpointConfig(
        "s", "s3", key = "k", config = Map.empty))
    }
    assert(m.getMessage.contains("bucket"))
  }

  test("boot from config file runs every key-paired pipeline (C6)") {
    val in = tmp(); val out = tmp() + "/boot_out"
    Files.write(java.nio.file.Paths.get(in, "d.jsonl"),
      java.util.List.of("""{"x":"boot me"}"""))
    val engine = new Engine(spark)
    val keys = engine.bootFromConfigFile(
      s"""{"sources": [{"name":"s","type":"file","key":"bk",
         |    "config":{"path":"$in","transforms":"uppercase"}}],
         | "sinks":   [{"name":"o","type":"file","key":"bk",
         |    "config":{"file_path":"$out"}}]}""".stripMargin,
      streaming = false)
    assert(keys === Seq("bk"))
    assert(spark.read.text(out).as[String].head().contains("BOOT ME"))
  }

  test("engine status/readyz surface (C4/C5)") {
    val engine = new Engine(spark)
    assert(engine.ready)
    assert(engine.status().isEmpty)
    assert(!engine.deletePipeline("nope"))
  }
}
