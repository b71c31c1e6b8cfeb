package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model.EndpointConfig
import graft.sinks.Sinks
import graft.sources.Sources

/** K6/S6 http endpoints against an in-process JDK HttpServer — no
  * network egress, real HTTP semantics (status codes, bodies, chunked
  * posts from executor partitions). */
class HttpSpec extends SparkTestBase {
  import spark.implicits._

  /** Start a one-route server on an ephemeral port; returns (port, stop). */
  private def serve(path: String)(handler: HttpExchange => Unit): (Int, () => Unit) = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext(path, (ex: HttpExchange) => handler(ex))
    srv.start()
    (srv.getAddress.getPort, () => srv.stop(0))
  }

  private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("http sink POSTs every row as NDJSON from executor partitions (K6)") {
    val received = new ConcurrentLinkedQueue[String]()
    val (port, stop) = serve("/ingest") { ex =>
      received.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      respond(ex, 200)
    }
    try {
      val df = (1 to 10).map(i => (i, s"p$i")).toDF("id", "payload").repartition(3)
      Sinks.batch("http")(df, EndpointConfig("h", "http", key = "hk",
        config = Map("url" -> s"http://127.0.0.1:$port/ingest", "batch_size" -> "2")))
      val lines = received.toArray(Array.empty[String])
        .flatMap(_.split("\n")).filter(_.nonEmpty)
      assert(lines.length === 10)
      // chunking honored: 10 rows / batch_size 2 -> at least 5 posts
      assert(received.size >= 5)
      val ids = lines.map(l =>
        l.replaceAll(""".*"id":(\d+).*""", "$1").toInt).sorted
      assert(ids.toSeq === (1 to 10))
    } finally stop()
  }

  test("http sink fails the job on a non-2xx response (no silent drops)") {
    val (port, stop) = serve("/broken")(ex => respond(ex, 503))
    try {
      val e = intercept[Exception] {
        Sinks.batch("http")(Seq(1).toDF("i"),
          EndpointConfig("h", "http", key = "hk2",
            config = Map("url" -> s"http://127.0.0.1:$port/broken")))
      }
      // the task failure carries the status in its causal chain
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("503")))
    } finally stop()
  }

  test("http source GETs an NDJSON endpoint into payload rows (S6)") {
    val (port, stop) = serve("/feed")(ex =>
      respond(ex, 200, "{\"k\":\"a\"}\n{\"k\":\"b\"}\n{\"k\":\"c\"}\n"))
    try {
      val c = EndpointConfig("h", "http", key = "hk3",
        config = Map("url" -> s"http://127.0.0.1:$port/feed"))
      val got = Sources.resolveBatch(c)(spark, c).as[String].collect().toSet
      assert(got === Set("""{"k":"a"}""", """{"k":"b"}""", """{"k":"c"}"""))
    } finally stop()
  }

  test("many-URL http source fetches per partition on executors (S6 at scale)") {
    val (port, stop) = serve("/") { ex =>
      val body = ex.getRequestURI.getPath match {
        case "/feed1" => "{\"src\":1,\"row\":\"a\"}\n{\"src\":1,\"row\":\"b\"}\n"
        case "/feed2" => "{\"src\":2,\"row\":\"c\"}\n"
        case _        => ""
      }
      respond(ex, 200, body)
    }
    try {
      val urls = s"http://127.0.0.1:$port/feed1, http://127.0.0.1:$port/feed2"
      val c = EndpointConfig("h", "http", key = "hk5",
        config = Map("urls" -> urls))
      val df = Sources.resolveBatch(c)(spark, c)
      // one partition per URL (capped by fetch_partitions)
      assert(df.rdd.getNumPartitions === 2)
      assert(df.as[String].collect().toSet === Set(
        """{"src":1,"row":"a"}""", """{"src":1,"row":"b"}""",
        """{"src":2,"row":"c"}"""))
    } finally stop()
  }

  test("many-URL http source: urls_path table layout + failed URL fails the job") {
    val (port, stop) = serve("/") { ex =>
      if (ex.getRequestURI.getPath == "/ok") respond(ex, 200, "{\"k\":1}\n")
      else respond(ex, 500)
    }
    try {
      val dir = java.nio.file.Files.createTempDirectory("grafturls")
      java.nio.file.Files.write(dir.resolve("urls.txt"),
        java.util.List.of(s"http://127.0.0.1:$port/ok"))
      val c = EndpointConfig("h", "http", key = "hk6",
        config = Map("urls_path" -> dir.toString, "fetch_partitions" -> "2"))
      assert(Sources.resolveBatch(c)(spark, c).as[String].collect()
        === Array("""{"k":1}"""))
      // a non-2xx URL in the set fails the task → the job (no drops)
      val bad = EndpointConfig("h", "http", key = "hk7",
        config = Map("urls" -> s"http://127.0.0.1:$port/ok,http://127.0.0.1:$port/nope"))
      val e = intercept[Exception] {
        Sources.resolveBatch(bad)(spark, bad).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("500")))
    } finally stop()
  }

  test("http streaming sink posts each micro-batch (foreachBatch path)") {
    val received = new ConcurrentLinkedQueue[String]()
    val (port, stop) = serve("/stream") { ex =>
      received.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      respond(ex, 200)
    }
    try {
      val dir = java.nio.file.Files.createTempDirectory("grafthttp").toString
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.jsonl"),
        java.util.List.of("""{"k":"x"}""", """{"k":"y"}"""))
      val src = spark.readStream.text(dir).withColumnRenamed("value", "payload")
      val c = EndpointConfig("h", "http", key = "hk4",
        config = Map("url" -> s"http://127.0.0.1:$port/stream",
          "checkpoint" -> (dir + "/ck")))
      val q = Sinks.configureStream(src, c).start()
      q.processAllAvailable(); q.stop()
      val lines = received.toArray(Array.empty[String])
        .flatMap(_.split("\n")).filter(_.nonEmpty).toSet
      assert(lines === Set("""{"payload":"{\"k\":\"x\"}"}""",
        """{"payload":"{\"k\":\"y\"}"}"""))
    } finally stop()
  }

  // ---- webhook source: inbound POSTs -> atomic spool files -> the
  // streaming file source (README.md:66-83 declares it; the reference
  // ships no code for it)

  private def post(url: String, body: String): Int = {
    val client = java.net.http.HttpClient.newHttpClient()
    client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  test("webhook source: POSTed payloads become stream rows; GET rejected; body capped") {
    val spool = java.nio.file.Files.createTempDirectory("graft_webhook_").toString
    val rx = Sources.WebhookSource.start(spool, maxBodyBytes = 1024)
    try {
      val base = s"http://127.0.0.1:${rx.port}/"
      assert(post(base, """{"ev":"a"}""") === 204)
      assert(post(base, "{\"ev\":\"b\"}\n{\"ev\":\"c\"}") === 204) // NDJSON: 2 rows
      assert(post(base, "x" * 2000) === 413) // bomb-capped, not spooled
      // GET is not an ingestion verb
      val getCode = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(base)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
      assert(getCode === 405)
      val cfg = EndpointConfig("wh", "webhook",
        config = Map("spool_path" -> spool), key = "whk")
      val q = Sources.resolveStream(cfg)(spark, cfg)
        .writeStream.format("memory").queryName("wh_rows")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val rows = spark.table("wh_rows").collect().map(_.getString(0)).toSet
      assert(rows === Set("""{"ev":"a"}""", """{"ev":"b"}""", """{"ev":"c"}"""))
    } finally rx.stop()
  }
}
