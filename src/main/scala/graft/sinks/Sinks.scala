package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sink registry (reference K4, `internal/pipeline/config.go:271-290`).
  *
  * - K1 file sink: one JSON doc per line (NDJSON append) —
  *   `sinks/file.go:75-123`. Spark's file sink is exactly-once per
  *   query via the commit log (an intentional upgrade over the
  *   reference's raw O_APPEND, SURVEY §7 risks).
  * - K2 kafka sink: `sinks/kafka.go:79-147` → built-in kafka format.
  * - K3 elasticsearch sink semantics (upsert-by-_id into an index,
  *   `sinks/elasticsearch.go:61-135` — orphaned in the reference) →
  *   [[EsLikeSink]]: foreachBatch idempotent upsert by id into a
  *   parquet "index" directory.
  */
object Sinks {
  import graft.model.EndpointConfig

  private def path(c: EndpointConfig): String =
    c.config.getOrElse("file_path",
      c.config.getOrElse("path", sys.error(s"sink '${c.name}': missing path")))

  /** Batch writers: DataFrame → side effect. */
  type BatchSink = (DataFrame, EndpointConfig) => Unit

  val batch: Map[String, BatchSink] = Map(
    "file" -> ((df, c) => // NDJSON, one doc per line (file.go:104-118)
      df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
        .write.mode("append").text(path(c))),
    "parquet" -> ((df, c) => df.write.mode(
      c.config.getOrElse("mode", "append")).parquet(path(c))),
    "orc" -> ((df, c) => df.write.mode(
      c.config.getOrElse("mode", "append")).orc(path(c))),
    "kafka" -> ((df, c) =>
      df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", c.config.getOrElse("bootstrap_servers", ""))
        .option("topic", c.config.getOrElse("topic", "")).save()),
    "es" -> ((df, c) => EsLikeSink.upsertBatch(df, path(c),
      c.config.getOrElse("id_field", "_id"))),
    // README-declared jdbc sink (tested against embedded Derby).
    "jdbc" -> ((df, c) =>
      df.write.format("jdbc")
        .option("url", c.config.getOrElse("url",
          sys.error(s"sink '${c.name}': missing 'url'")))
        .option("dbtable", c.config.getOrElse("dbtable",
          sys.error(s"sink '${c.name}': missing 'dbtable'")))
        .mode(c.config.getOrElse("mode", "append")).save()),
    // README-declared http sink: NDJSON chunks POSTed FROM THE
    // EXECUTORS (foreachPartition), so a big write fans out across the
    // cluster instead of draining through the driver.
    "http" -> ((df, c) => HttpSink.postBatch(df, c)),
    // README-declared s3 sink (ref README.md:82). On Spark, S3 is just
    // a filesystem scheme: the write IS the parquet/json writer against
    // an s3a:// path, with credentials/endpoint passed as per-bucket
    // hadoop conf. This sandbox has no hadoop-aws jar, so execution is
    // environment-blocked — the config→(path, hadoopConf, format)
    // mapping is factored into [[s3WritePlan]] and dry-spec'd, and the
    // writer fails with Hadoop's clear "No FileSystem for scheme s3a"
    // rather than anything graft-specific.
    "s3" -> ((df, c) => {
      val (dest, hadoopConf, fmt) = s3WritePlan(c)
      hadoopConf.foreach { case (k, v) =>
        df.sparkSession.sparkContext.hadoopConfiguration.set(k, v) }
      df.write.mode(c.config.getOrElse("mode", "append")).format(fmt).save(dest)
    }))

  /** The s3 sink's config mapping, separated for dry verification:
    * `bucket` (+ optional `prefix`) → `s3a://bucket/prefix`;
    * `endpoint`/`access_key`/`secret_key`/`path_style` → the
    * corresponding `fs.s3a.*` keys (per-bucket scoped so two s3 sinks
    * with different credentials can coexist in one session);
    * `format` → json (NDJSON parity with the file sink) or parquet. */
  def s3WritePlan(c: EndpointConfig): (String, Map[String, String], String) = {
    val bucket = c.config.getOrElse("bucket",
      sys.error(s"sink '${c.name}': missing 'bucket'"))
    val prefix = c.config.get("prefix").map(p => s"/${p.stripPrefix("/")}").getOrElse("")
    val scoped = s"fs.s3a.bucket.$bucket"
    val conf = Map.newBuilder[String, String]
    c.config.get("endpoint").foreach(v => conf += s"$scoped.endpoint" -> v)
    c.config.get("access_key").foreach(v => conf += s"$scoped.access.key" -> v)
    c.config.get("secret_key").foreach(v => conf += s"$scoped.secret.key" -> v)
    c.config.get("path_style").foreach(v =>
      conf += s"$scoped.path.style.access" -> v)
    (s"s3a://$bucket$prefix", conf.result(), c.config.getOrElse("format", "json"))
  }

  /** Streaming writers: configure a DataStreamWriter (caller starts it). */
  def configureStream(df: DataFrame, c: EndpointConfig): DataStreamWriter[Row] = {
    val base = df.writeStream
      .trigger(Trigger.ProcessingTime(
        // Q10 queue flush cadence (service.go:373-375: 50-100ms default)
        c.config.getOrElse("trigger_ms", "100").toInt, java.util.concurrent.TimeUnit.MILLISECONDS))
    c.connectionType match {
      case "file" =>
        base.format("json").option("path", path(c))
          .option("checkpointLocation", checkpoint(c))
      case "parquet" =>
        base.format("parquet").option("path", path(c))
          .option("checkpointLocation", checkpoint(c))
      case "kafka" =>
        base.format("kafka")
          .option("kafka.bootstrap.servers", c.config.getOrElse("bootstrap_servers", ""))
          .option("topic", c.config.getOrElse("topic", ""))
          .option("checkpointLocation", checkpoint(c))
      case "memory" =>
        base.format("memory").queryName(c.config.getOrElse("query_name", c.key))
      case "console" => base.format("console")
      case "es" =>
        base.option("checkpointLocation", checkpoint(c))
          .foreachBatch((batchDf: DataFrame, _: Long) =>
            EsLikeSink.upsertBatch(batchDf, path(c),
              c.config.getOrElse("id_field", "_id")))
      case "jdbc" => // per-micro-batch append through the batch writer
        base.option("checkpointLocation", checkpoint(c))
          .foreachBatch((batchDf: DataFrame, _: Long) =>
            batch("jdbc")(batchDf, c))
      case "http" =>
        base.option("checkpointLocation", checkpoint(c))
          .foreachBatch((batchDf: DataFrame, _: Long) =>
            HttpSink.postBatch(batchDf, c))
      case other =>
        throw new IllegalArgumentException(s"invalid sink type: $other")
    }
  }

  private def checkpoint(c: EndpointConfig): String =
    c.config.getOrElse("checkpoint",
      s"${System.getProperty("java.io.tmpdir")}/graft-ckpt-${c.key}")
}

/** K6 http sink: rows as NDJSON, POSTed in bounded chunks from each
  * partition via the JDK's own HTTP client (no extra deps). The POST
  * runs inside foreachPartition, i.e. on the EXECUTORS — at 1000
  * executors that is 1000 concurrent upload lanes, where a
  * collect-then-post design would serialize everything through the
  * driver. `batch_size` bounds per-request body memory. Non-2xx
  * responses fail the task (and with it the Spark job/micro-batch), so
  * delivery failures surface instead of dropping data silently. */
object HttpSink {
  def postBatch(df: DataFrame, c: graft.model.EndpointConfig): Unit = {
    val url = c.config.getOrElse("url", sys.error(s"sink '${c.name}': missing 'url'"))
    val chunk = c.config.getOrElse("batch_size", "500").toInt
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val client = java.net.http.HttpClient.newHttpClient()
        it.grouped(chunk).foreach { lines =>
          val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
            .header("Content-Type", "application/x-ndjson")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              lines.mkString("", "\n", "\n")))
            .build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() >= 300)
            sys.error(s"http sink: POST $url returned ${resp.statusCode()}")
        }
      }
    }
  }
}

/** K3 semantics: idempotent upsert-by-id into a keyed parquet "index"
  * (stand-in for an Elasticsearch index; the ES REST call is the only
  * part stubbed — the dedup/merge plumbing is real). Latest write per
  * id wins, matching ES document replacement.
  *
  * Scale design: the index is laid out as `__bucket=N/` partitions,
  * `__bucket = pmod(xxhash64(__id), numBuckets)`. A micro-batch reads
  * and rewrites ONLY the buckets its ids hash into (partition pruning
  * skips the rest at the scan, per-bucket directory swap skips them at
  * the write) — per-batch cost is O(touched buckets), not O(index).
  * The round-1 version rewrote the whole index every batch. */
object EsLikeSink {
  def upsertBatch(df: DataFrame, indexPath: String, idField: String,
      numBuckets: Int = 16): Unit = {
    val spark = df.sparkSession
    val withId = df
      .withColumn("__id",
        coalesce(get_json_object(col(df.columns.head), s"$$.$idField"),
          col(df.columns.head)))
      .withColumn("__bucket",
        pmod(xxhash64(col("__id")), lit(numBuckets)).cast("int"))
    // touched bucket ids: at most numBuckets scalars — not a data collect
    val touched = withId.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(indexPath)
    // Only a genuinely-absent (or empty) index reads as empty. Any
    // other read failure — corrupt footer, transient IO — must FAIL
    // the batch: swallowing it would silently erase every previously-
    // indexed doc in the touched buckets on the swap below.
    val existing =
      if (!fs.exists(root) || fs.listStatus(root).isEmpty) spark.emptyDataFrame
      else spark.read.parquet(indexPath)
    val legacy = // pre-bucketing layout: migrate by rewriting once
      existing.columns.contains("__id") && !existing.columns.contains("__bucket")
    val (oldTouched, swapBuckets) =
      if (existing.isEmpty || !existing.columns.contains("__id"))
        (None, touched)
      else if (legacy)
        (Some(existing.withColumn("__bucket",
          pmod(xxhash64(col("__id")), lit(numBuckets)).cast("int"))),
          (0 until numBuckets).toSeq)
      else
        // partition filter → only touched __bucket=N dirs are scanned
        (Some(existing.filter(col("__bucket")
          .isin(touched.map(Integer.valueOf): _*))), touched)
    val merged = oldTouched match {
      case None => withId
      case Some(old) =>
        old.join(withId.select(col("__id").as("__new_id")),
          col("__id") === col("__new_id"), "left_anti")
          .drop("__new_id")
          .unionByName(withId, allowMissingColumns = true)
    }
    // stage the touched buckets, then swap each bucket dir into place —
    // untouched buckets' files are never read, written, or moved.
    // The per-bucket delete-then-rename is NOT crash-atomic (a crash
    // between them loses that bucket until the batch replays) —
    // acceptable for this ES stand-in, whose real sink is an idempotent
    // upsert the replay re-sends; a production file-backed index would
    // swap via a manifest commit instead.
    val staging = new org.apache.hadoop.fs.Path(indexPath + ".staging")
    merged.write.mode("overwrite").partitionBy("__bucket")
      .parquet(staging.toString)
    if (legacy) fs.delete(root, true)
    fs.mkdirs(root)
    for (b <- swapBuckets) {
      val src = new org.apache.hadoop.fs.Path(staging, s"__bucket=$b")
      if (fs.exists(src)) {
        val dst = new org.apache.hadoop.fs.Path(root, s"__bucket=$b")
        fs.delete(dst, true)
        fs.rename(src, dst)
      }
    }
    fs.delete(staging, true)
  }
}
