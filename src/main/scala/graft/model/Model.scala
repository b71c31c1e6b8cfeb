package graft.model

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.types._

/** Config + envelope model, re-expressed from the reference.
  *
  * - Endpoint config shape `{name, type, config, key}`:
  *   `/root/reference/sources/config.go:3-8`, `sinks/config.go:3-8`;
  *   the `key` joins one source and one sink into a pipeline
  *   (`internal/pipeline/config.go:90-149`).
  * - HTTP create body `{source: {...}, sink: {...}}`:
  *   `internal/http/model.go:9-12`.
  */
final case class EndpointConfig(
    name: String,
    connectionType: String, // json field "type"
    config: Map[String, String],
    key: String)

final case class PipelineSpec(source: EndpointConfig, sink: EndpointConfig)

object ConfigParser {
  private val mapper = new ObjectMapper()
  mapper.registerModule(DefaultScalaModule)

  private def endpoint(node: com.fasterxml.jackson.databind.JsonNode): EndpointConfig = {
    import scala.jdk.CollectionConverters._
    val cfgNode = node.path("config")
    val cfg =
      if (cfgNode.isObject)
        cfgNode.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      else Map.empty[String, String]
    EndpointConfig(
      name = node.path("name").asText(""),
      connectionType = node.path("type").asText(""),
      config = cfg,
      key = node.path("key").asText(""))
  }

  /** Parse `{"source": {...}, "sink": {...}}`. */
  def parsePipelineSpec(json: String): PipelineSpec = {
    val root = mapper.readTree(json)
    require(root.has("source") && root.has("sink"),
      "pipeline spec requires 'source' and 'sink'")
    PipelineSpec(endpoint(root.get("source")), endpoint(root.get("sink")))
  }

  /** Parse a whole config file `{"sources": [...], "sinks": [...]}` and
    * pair entries by `key` (config.go:90-149 semantics). */
  def parseConfigFile(json: String): Seq[PipelineSpec] = {
    import scala.jdk.CollectionConverters._
    val root = mapper.readTree(json)
    val sources = root.path("sources").elements().asScala.map(endpoint).toSeq
    val sinks = root.path("sinks").elements().asScala.map(endpoint).toSeq
    val sinksByKey = sinks.groupBy(_.key)
    sources.flatMap(src =>
      sinksByKey.getOrElse(src.key, Nil).map(snk => PipelineSpec(src, snk)))
  }
}

/** Row schemas for the engine's envelopes. */
object Schemas {
  /** The Job envelope (`internal/models/job.go:14-25`): id is UUIDv7
    * there (time-ordered); payload stays a JSON string (schemaless by
    * design), parsed on demand at operator boundaries. */
  val job: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("payload", StringType),
    StructField("node_created_at", TimestampType),
    StructField("node_updated_at", TimestampType),
    StructField("event_time", TimestampType),
    StructField("priority", IntegerType)))

  /** Mongo CDC envelope (`sources/mongo.go:23-41`); only fullDocument
    * flows downstream (mongo.go:274). */
  val cdc: StructType = StructType(Seq(
    StructField("resume_token", StringType),
    StructField("document_key", StringType),
    StructField("operation_type", StringType),
    StructField("full_document", StringType),
    StructField("wall_time", TimestampType),
    StructField("ns", StructType(Seq(
      StructField("db", StringType), StructField("coll", StringType)))),
    StructField("cluster_time", TimestampType)))

  /** KV state table. */
  val kv: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType)))
}
