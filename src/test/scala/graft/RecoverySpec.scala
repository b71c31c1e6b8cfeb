package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Fault-tolerance spec: the reference documents at-most-once delivery
  * with drop windows (`sources/mongo.go:294`, `partition.go:26-27`);
  * Spark's checkpoint + file-sink commit log give exactly-once across
  * restarts — verify a stop/restart mid-stream neither loses nor
  * duplicates records. */
class RecoverySpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graftrec").toString

  test("streaming pipeline resumes from checkpoint without loss or duplication") {
    val src = tmp(); val out = tmp() + "/out"; val ckpt = tmp() + "/ck"
    Files.write(Paths.get(src, "a.jsonl"),
      java.util.List.of("""{"id":1}""", """{"id":2}"""))

    def start() = spark.readStream.text(src)
      .select(get_json_object($"value", "$.id").cast("long").as("id"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // simulated failure/redeploy

    // new data arrives while "down"
    Files.write(Paths.get(src, "b.jsonl"),
      java.util.List.of("""{"id":3}""", """{"id":1}"""))

    val q2 = start() // resume from the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(out).as[Long].collect().sorted.toSeq
    // every record exactly once — including the duplicate id=1 payload,
    // which is a distinct RECORD (dedup is an operator choice, not a
    // transport artifact)
    assert(ids === Seq(1L, 1L, 2L, 3L))
  }
}
