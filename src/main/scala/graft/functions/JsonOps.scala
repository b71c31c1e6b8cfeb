package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-static JSON helpers invoked from generated code (whole-stage
  * codegen calls these directly, so the expressions below stay inside
  * the codegen'd stage instead of falling back to interpreted eval).
  *
  * Semantics re-expressed from the reference's recursive JSON
  * transform (`/root/reference/internal/pipeline/pipeline.go:282-340`,
  * duplicated at `internal/transform/transform.go:192-234`): uppercase
  * every string *value* — keys untouched — recursing through nested
  * objects and arrays; numbers / booleans / nulls pass through. The
  * reference applies this to `[]byte` payloads (making it a de-facto
  * no-op there); we implement the documented intent.
  */
object JsonOps {
  // ObjectMapper is thread-safe after configuration; one per JVM.
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(DeserializationFeature.USE_LONG_FOR_INTS, false)
    m
  }

  private def upperNode(node: JsonNode): JsonNode = node match {
    case t: TextNode => TextNode.valueOf(t.textValue().toUpperCase)
    case o: ObjectNode =>
      val it = o.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.setValue(upperNode(e.getValue))
      }
      o
    case a: ArrayNode =>
      var i = 0
      while (i < a.size()) { a.set(i, upperNode(a.get(i))); i += 1 }
      a
    case other => other
  }

  /** Recursively uppercase all string values of a JSON document.
    * Malformed JSON returns null (tolerated, mirroring the reference's
    * error-swallowing at pipeline.go:299-302). */
  def upperJson(json: UTF8String): UTF8String = {
    if (json == null) return null
    try {
      val node = mapper.readTree(json.toString)
      if (node == null || node.isMissingNode) null
      else UTF8String.fromString(mapper.writeValueAsString(upperNode(node)))
    } catch { case _: Exception => null }
  }
}
