package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media() = Seq(
    (1L, "some fake image bytes".getBytes("UTF-8")),
    (2L, "other media content here".getBytes("UTF-8")),
    (3L, Array.emptyByteArray))
    .toDF("media_id", "media")

  test("extractFeatures: deterministic, partition-local, right shape") {
    val f1 = Multimodal.extractFeatures(media()).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media().repartition(3))
      .collect().sortBy(_.media_id)
    assert(f1.map(_.content_hash).toSeq === f2.map(_.content_hash).toSeq)
    assert(f1.forall(_.feature.length === 8))
    assert(f1(0).n_bytes === 21)
    assert(f1(2).n_bytes === 0) // empty media tolerated
    // no shuffle: plan has no Exchange
    val plan = Multimodal.extractFeatures(media())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("resizeMeta preserves aspect ratio and never upscales") {
    val df = Seq((1920, 1080), (100, 50), (640, 4800)).toDF("fake_width", "fake_height")
    val got = Multimodal.resizeMeta(df, 640, 480).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got(0) === ((1920, 1080, 640, 360)))   // downscale by width
    assert(got(1) === ((100, 50, 100, 50)))       // no upscale
    assert(got(2) === ((640, 4800, 64, 480)))     // downscale by height
  }

  test("sampleFrames explodes n frames per video row") {
    val frames = Multimodal.sampleFrames(media().filter($"media_id" < 3), 4)
    assert(frames.count() === 8)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 4L, 2L -> 4L))
  }
}
