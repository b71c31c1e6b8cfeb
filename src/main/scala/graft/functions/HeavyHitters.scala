package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters aggregate: finds all items occurring more
  * than n/(k+1) times using O(k) space per partition — a
  * TypedImperativeAggregate, so partial aggregation (map-side combine)
  * and buffer serialization work like any built-in aggregate.
  *
  * Guarantees: reported count C satisfies true - n/(k+1) <= C <= true;
  * when k >= number of distinct items the counts are EXACT (no
  * decrements ever happen) — which makes the aggregate oracle-testable
  * on a bounded vocabulary.
  *
  * Merging two summaries sums counts, then applies the standard
  * shrink-to-k decrement, preserving the error bound (Agarwal et al.,
  * "Mergeable Summaries", PODS'12).
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def shrink(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size > k) {
      // decrement all by the (k+1)-th largest count; drop <= 0.
      // Update path inserts one item at a time, so size == k+1 there
      // and the (k+1)-th largest IS the minimum — one O(k) scan, no
      // sort. Merge can reach 2k entries; select the (size-k)-th
      // smallest with a bounded max-heap, O(size·log(size-k)).
      val excess = buf.size - k
      val dec =
        if (excess == 1) buf.values.min
        else {
          val heap = mutable.PriorityQueue.empty[Long] // max-heap of smallest `excess`
          buf.values.foreach { v =>
            if (heap.size < excess) heap.enqueue(v)
            else if (v < heap.head) { heap.dequeue(); heap.enqueue(v) }
          }
          heap.head
        }
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, v) => v - dec)
      buf.foreach { case (key, v) => if (v <= 0) dead += key }
      dead.foreach(buf.remove)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.update(s, buf.getOrElse(s, 0L) + 1L)
      shrink(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf.update(s, buf.getOrElse(s, 0L) + c) }
    shrink(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq.sortBy { case (s, c) => (-c, s) }.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  /** Column API: `df.agg(heavy_hitters($"token", 64))`. */
  def heavy_hitters(c: Column, k: Int): Column =
    GraftSql.column(HeavyHitters(GraftSql.expression(c), k)
      .toAggregateExpression())
}
