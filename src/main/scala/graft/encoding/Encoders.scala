package graft.encoding

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.kv.ExecResult

/** Result shaping, re-expressed from the reference's JSON encoders
  * (`/root/reference/internal/command/encoding/json.go`):
  *
  *  - R1 positional: `{"columns": [...], "types": [...], "values": [[...]]}`
  *    (json.go:108-125; HTML escaping disabled, :231-239 — Jackson
  *    doesn't escape HTML by default, matching)
  *  - R2 associative: `{"types": {col: type}, "rows": [{col: val}]}`
  *    (json.go:128-158)
  *  - R3 blob-as-array mode: binary rendered `[int,...]` instead of
  *    base64 (json.go:52-62)
  *  - R4 scalar mapping int64/float64/bool/bytes/string/null
  *    (json.go:161-202)
  *
  * These render *collected* result tables (point lookups, control-plane
  * responses) — they are the API-layer boundary, never part of a
  * distributed plan.
  */
object ResultEncoder {
  private val mapper = new ObjectMapper()

  /** Spark type → reference type vocabulary ("text"/"blob"/...,
    * store.go:1340-1382). */
  def typeName(dt: DataType): String = dt match {
    case StringType                         => "text"
    case BinaryType                         => "blob"
    case LongType | IntegerType | ShortType => "integer"
    case DoubleType | FloatType             => "real"
    case BooleanType                        => "boolean"
    case _: DecimalType                     => "numeric"
    case TimestampType | DateType           => "timestamp"
    case other                              => other.simpleString
  }

  private def putValue(arr: ArrayNode, v: Any, blobAsArray: Boolean): Unit = v match {
    case null                 => arr.addNull()
    case b: Array[Byte] if blobAsArray =>
      val inner = arr.addArray(); b.foreach(x => inner.add(x & 0xff))
    case b: Array[Byte]       => arr.add(java.util.Base64.getEncoder.encodeToString(b))
    case i: Int               => arr.add(i.toLong)
    case l: Long              => arr.add(l)
    case d: Double            => arr.add(d)
    case f: Float             => arr.add(f.toDouble)
    case s: Short             => arr.add(s.toLong)
    case b: Boolean           => arr.add(b)
    case d: java.math.BigDecimal => arr.add(d)
    case other                => arr.add(other.toString)
  }

  private def putField(obj: ObjectNode, name: String, v: Any, blobAsArray: Boolean): Unit =
    v match {
      case null                 => obj.putNull(name)
      case b: Array[Byte] if blobAsArray =>
        val inner = obj.putArray(name); b.foreach(x => inner.add(x & 0xff))
      case b: Array[Byte]       => obj.put(name, java.util.Base64.getEncoder.encodeToString(b))
      case i: Int               => obj.put(name, i.toLong)
      case l: Long              => obj.put(name, l)
      case d: Double            => obj.put(name, d)
      case f: Float             => obj.put(name, f.toDouble)
      case s: Short             => obj.put(name, s.toLong)
      case b: Boolean           => obj.put(name, b)
      case d: java.math.BigDecimal => obj.put(name, d)
      case other                => obj.put(name, other.toString)
    }

  /** R1: positional rows. Collects — intended for small (point-lookup /
    * control-plane) results only. */
  def positional(df: DataFrame, blobAsArray: Boolean = false): String = {
    val root = mapper.createObjectNode()
    val cols = root.putArray("columns")
    val types = root.putArray("types")
    df.schema.fields.foreach { f => cols.add(f.name); types.add(typeName(f.dataType)) }
    val values = root.putArray("values")
    df.collect().foreach { row =>
      val r = values.addArray()
      row.toSeq.foreach(v => putValue(r, v, blobAsArray))
    }
    mapper.writeValueAsString(root)
  }

  /** R2: associative rows. */
  def associative(df: DataFrame, blobAsArray: Boolean = false): String = {
    val root = mapper.createObjectNode()
    val types = root.putObject("types")
    df.schema.fields.foreach(f => types.put(f.name, typeName(f.dataType)))
    val rows = root.putArray("rows")
    val names = df.schema.fieldNames
    df.collect().foreach { row =>
      val o = rows.addObject()
      names.zip(row.toSeq).foreach { case (n, v) => putField(o, n, v, blobAsArray) }
    }
    mapper.writeValueAsString(root)
  }

  /** Write-statement result: `{"last_insert_id": n, "rows_affected": n}`
    * (+ `"error"` when present), matching json.go's ExecuteQueryResponse. */
  def execResult(r: ExecResult): String = {
    val o = mapper.createObjectNode()
    o.put("last_insert_id", r.lastInsertId)
    o.put("rows_affected", r.rowsAffected)
    r.error.foreach(e => o.put("error", e))
    mapper.writeValueAsString(o)
  }

  def execResults(rs: Seq[ExecResult]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("results")
    rs.foreach { r =>
      val o = arr.addObject()
      r.error match {
        case Some(e) => o.put("error", e)
        case None =>
          o.put("last_insert_id", r.lastInsertId)
          o.put("rows_affected", r.rowsAffected)
      }
    }
    mapper.writeValueAsString(root)
  }
}
