package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.sql.types._

/** Bounded per-key top-k aggregate: keeps the k best (ord DESC,
  * id ASC) pairs in an O(k) buffer with map-side combine — the
  * scale-correct alternative to `row_number() OVER (PARTITION BY key
  * ORDER BY ord DESC)` + `rk <= k`, whose shuffle carries EVERY row of
  * every key to the key's partition before any is discarded. Here each
  * map task pre-reduces its rows to k per key, so the exchange moves
  * O(keys × k) regardless of input size — at 100 TB with millions of
  * rows per hot key, that is the difference between shuffling the
  * table and shuffling the answer.
  *
  * The carried value is an id, not the full row: downstream joins fat
  * payload columns back by id AFTER the top-k cut (ids-only shuffle —
  * same discipline as the LSH band joins). Exact, not approximate:
  * merge keeps the k best of both buffers, and top-k selection is
  * associative/commutative under a total order — (ord DESC, id ASC)
  * is total because ids are unique.
  */
case class BoundedTopK(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  require(k >= 1, s"top_k_by: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("ord", DoubleType))))

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  // (ord DESC, id ASC) — a TOTAL order because ids are unique
  private val better: Ordering[(Double, Long)] =
    Ordering.by { case (o, i) => (-o, i) }

  /** Sort + truncate to k. Called when the buffer doubles past k, so
    * amortized cost per row is O(log k'ish), not O(k log k). */
  private def compact(buf: mutable.ArrayBuffer[(Double, Long)]): Unit =
    if (buf.size > k) {
      val best = buf.sorted(better).take(k)
      buf.clear(); buf ++= best
    }

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      buf += ((o.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Double, Long)],
      other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
    compact(buf)
    val rows = buf.sorted(better).map { case (o, i) => InternalRow(i, o) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf) // never ship more than k over the wire
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, i) => out.writeDouble(o); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    (0 until n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(ord = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_by"
}

object BoundedTopK {
  /** Column API: `df.groupBy(keys).agg(top_k_by($"value", $"event_id", 3))`
    * → `array<struct<id, ord>>` sorted best-first. */
  def top_k_by(ord: Column, id: Column, k: Int): Column =
    GraftSql.column(BoundedTopK(
      GraftSql.expression(ord.cast("double")),
      GraftSql.expression(id.cast("long")), k)
      .toAggregateExpression())
}
