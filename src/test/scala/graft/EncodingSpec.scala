package graft

import graft.encoding.ResultEncoder
import graft.kv.ExecResult

/** Result-shaping spec, mirroring the reference's encoding tests
  * (`/root/reference/internal/command/encoding/json_test.go` and the
  * FIXTURES.md A4 shapes). */
class EncodingSpec extends SparkTestBase {
  import spark.implicits._

  test("positional: {columns, types, values}; GET miss has empty values") {
    val df = Seq(("k", "v")).toDF("key", "value")
    val json = ResultEncoder.positional(df)
    assert(json === """{"columns":["key","value"],"types":["text","text"],"values":[["k","v"]]}""")
    val empty = ResultEncoder.positional(df.filter("key = 'nope'"))
    assert(empty === """{"columns":["key","value"],"types":["text","text"],"values":[]}""")
  }

  test("associative: {types: map, rows: [maps]}") {
    val df = Seq(("k", 7L)).toDF("key", "n")
    assert(ResultEncoder.associative(df) ===
      """{"types":{"key":"text","n":"integer"},"rows":[{"key":"k","n":7}]}""")
  }

  test("blob values: base64 by default, [int,...] in blob-array mode") {
    val df = Seq(("k", Array[Byte](1, 2, 255.toByte))).toDF("key", "value")
    assert(ResultEncoder.positional(df).contains("\"AQL/\""))
    assert(ResultEncoder.positional(df, blobAsArray = true)
      .contains("[1,2,255]"))
  }

  test("execute results match the reference response shape") {
    assert(ResultEncoder.execResult(ExecResult()) ===
      """{"last_insert_id":0,"rows_affected":1}""")
    assert(ResultEncoder.execResults(Seq(ExecResult(),
      ExecResult(error = Some("boom")))) ===
      """{"results":[{"last_insert_id":0,"rows_affected":1},{"error":"boom"}]}""")
  }

  test("no HTML escaping (json_test.go no-escape cases)") {
    val df = Seq(("<k>", "a&b")).toDF("key", "value")
    val json = ResultEncoder.positional(df)
    assert(json.contains("<k>") && json.contains("a&b"))
  }
}
