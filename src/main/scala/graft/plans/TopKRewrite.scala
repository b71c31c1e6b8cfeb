package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Generic bounded top-k-per-group over FULL rows: buffers at most 2k
  * combined rows `struct(orderKey..., payload struct)` per partial
  * buffer, compacting with an interpreted ordering over the leading
  * `directions.size` fields. The row-preserving generalization of
  * [[graft.functions.BoundedTopK]] (which carries only a (double, long)
  * pair): shuffle moves O(groups·k) rows instead of every row — the
  * plan shape a `row_number() <= k` window forces Spark to abandon
  * (full sort + full shuffle per partition).
  *
  * Ties beyond the ordering are broken by arrival, matching the
  * documented non-determinism of `row_number` itself under non-total
  * orders; under a total order results are identical to the window.
  */
case class RowTopK(
    child: Expression,
    directions: Seq[(Boolean, Boolean)], // (ascending, nullsFirst) per leading field
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[UnsafeRow]] {

  require(k >= 1, s"row top-k: k must be >= 1, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  @transient private lazy val ordering: Ordering[InternalRow] = {
    val sos = directions.zipWithIndex.map { case ((asc, nullsFirst), i) =>
      val f = structType(i)
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (asc) Ascending else Descending,
        if (nullsFirst) NullsFirst else NullsLast, Seq.empty)
    }
    new InterpretedOrdering(sos)
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[UnsafeRow] =
    mutable.ArrayBuffer.empty

  private def compact(buf: mutable.ArrayBuffer[UnsafeRow]): Unit =
    if (buf.size > k) {
      val best = buf.sorted(ordering.on((r: UnsafeRow) => r: InternalRow)).take(k)
      buf.clear(); buf ++= best
    }

  override def update(buf: mutable.ArrayBuffer[UnsafeRow],
      input: InternalRow): mutable.ArrayBuffer[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      buf += toUnsafe(v.asInstanceOf[InternalRow]).copy()
      if (buf.size > 2 * k) compact(buf) // amortized O(log k) per row
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[UnsafeRow],
      other: mutable.ArrayBuffer[UnsafeRow]): mutable.ArrayBuffer[UnsafeRow] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[UnsafeRow]): Any = {
    compact(buf)
    val sorted = buf.sorted(ordering.on((r: UnsafeRow) => r: InternalRow))
    new GenericArrayData(sorted.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[UnsafeRow]
    (0 until n).foreach { _ =>
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      val row = new UnsafeRow(structType.size)
      row.pointTo(b, len)
      buf += row
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): RowTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RowTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RowTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "row_top_k"
}

/** Optimizer rule: `Filter(row_number() <= k)` over a Window becomes a
  * bounded top-k aggregate + posexplode — the rewrite that turns the
  * single most common "top N per key" SQL idiom from a full-shuffle +
  * per-partition sort into an O(groups·k)-shuffle aggregation with
  * map-side combine. At 100 TB the window plan shuffles and sorts
  * EVERY row; the rewritten plan moves at most k rows per group per
  * partial buffer.
  *
  * Fires only when provably safe:
  *  - the Window computes exactly one expression, a `row_number()`
  *    (NOT rank/dense_rank: those keep every tie at the boundary, so
  *    the per-group buffer would be unbounded under ties — a rewrite
  *    that can OOM where the window's external sort survives);
  *  - the filter bounds it by a literal (`rn <= k`, `rn < k`, `rn = 1`,
  *    possibly AND'ed with conjuncts not referencing rn — those are
  *    re-applied on top);
  *  - every partition/order expression is deterministic and orderable;
  *  - k <= [[WindowTopKRewrite.maxK]] (the buffer is per-group
  *    in-memory state).
  *
  * The rewritten subtree reproduces the window's output EXACTLY —
  * original attribute ids are preserved via aliases and the
  * row-number column is regenerated from the explode position — so
  * downstream operators resolve unchanged.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val maxK = 8192

  /** Extract the bound from a conjunct on the rn attribute; None if
    * this conjunct does not bound rn from above. */
  private def bound(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) => Some(v)
    // the strict (<) forms exclude Int.MinValue: v - 1 would wrap to
    // Int.MaxValue and silently DROP an unsatisfiable conjunct (the
    // original plan returns zero rows; the wrapped rewrite would emit
    // top-MaxValue). Returning None instead routes the conjunct into
    // `rest`, where restReferencesRn keeps the Window — original
    // semantics preserved.
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) && v > Int.MinValue => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) && v > Int.MinValue => Some(v - 1)
    case _ => None
  }

  /** The Window shapes this rule can rewrite: exactly one window
    * expression, a `row_number()`, deterministic orderable specs. */
  private def rewritableRowNumber(w: Window): Option[Alias] = w match {
    case Window(Seq(alias @ Alias(we: WindowExpression, _)), partitionSpec, orderSpec, _, _)
      if we.windowFunction.isInstanceOf[RowNumber] &&
        orderSpec.nonEmpty &&
        (partitionSpec ++ orderSpec).forall(_.deterministic) &&
        orderSpec.forall(so => RowOrdering.isOrderable(so.dataType)) => Some(alias)
    case _ => None
  }

  /** Build the RowTopK aggregate + posexplode replacement for `w`
    * bounded at `k`. Output is attribute-for-attribute identical to
    * `w` (original exprIds preserved), so any operator that resolved
    * against the window resolves unchanged against the rewrite. */
  private def buildTopK(w: Window, alias: Alias, k: Int): LogicalPlan = {
    val Window(_, partitionSpec, orderSpec, child, _) = w
    val ordKeys: Seq[Expression] = orderSpec.map(_.child)
    val payload = CreateStruct(child.output)
    val combined = CreateStruct(ordKeys :+ (payload: Expression))
    val dirs = orderSpec.map(so =>
      (so.direction == Ascending, so.nullOrdering == NullsFirst))
    val aggAlias = Alias(
      RowTopK(combined, dirs, k).toAggregateExpression(), "__graft_topk")()
    val aggregate = Aggregate(partitionSpec, Seq(aggAlias), child)
    val elemType = combined.dataType.asInstanceOf[StructType]
    val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("__graft_row", elemType, nullable = false)()
    val generate = Generate(PosExplode(aggAlias.toAttribute),
      unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), aggregate)
    val payloadExpr = GetStructField(rowAttr, ordKeys.size)
    val cols = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(payloadExpr, i), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnCol = Alias(Add(posAttr, Literal(1)), alias.name)(
      exprId = alias.exprId, qualifier = alias.qualifier)
    Project(cols :+ rnCol, generate)
  }

  /** Split `cond` into an rn upper bound (on `rnOut`) and leftover
    * conjuncts; rewrite `w` when a valid bound exists and the leftovers
    * don't otherwise constrain rn. `wrap` re-inserts whatever sat
    * between the Filter and the Window (identity, or the intervening
    * Project) — the leftover conjuncts go back on top of it, where
    * their references still resolve. */
  private def rewriteBounded(cond: Expression, w: Window, alias: Alias,
      rnOut: Attribute, wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val ks = conjuncts.flatMap(c => bound(c, rnOut))
    val rest = conjuncts.filter(c => bound(c, rnOut).isEmpty)
    val restReferencesRn = rest.exists(_.references.contains(rnOut))
    if (ks.isEmpty || ks.min < 1 || ks.min > maxK || restReferencesRn) None
    else {
      val wrapped = wrap(buildTopK(w, alias, ks.min))
      Some(if (rest.isEmpty) wrapped else Filter(rest.reduce(And), wrapped))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewritableRowNumber(w).flatMap { alias =>
        rewriteBounded(cond, w, alias, alias.toAttribute, identity)
      }.getOrElse(f)

    // `withColumn(rn, ...).select(...).filter(rn <= k)` analyzes to
    // Filter(Project(Window)) — the rn attribute rides through the
    // Project either bare or under a direct alias. Push the bound
    // beneath the Project (safe: buildTopK preserves the window's
    // output exprIds, so the Project resolves unchanged on top) and
    // leave the non-rn conjuncts above it.
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.deterministic) =>
      (for {
        alias <- rewritableRowNumber(w)
        rnAttr = alias.toAttribute
        rnOut <- projList.collectFirst {
          case a: Attribute if a.exprId == rnAttr.exprId => a
          case al @ Alias(a: Attribute, _) if a.exprId == rnAttr.exprId =>
            al.toAttribute
        }
        rewritten <- rewriteBounded(cond, w, alias, rnOut,
          inner => Project(projList, inner))
      } yield rewritten).getOrElse(f)
  }
}

/** Opt-in Spark extension: `spark.sql.extensions=graft.plans.GraftOptimizations`
  * (composes with graft.GraftExtensions via a comma-separated list).
  * Opt-in rather than default because the rewrite trades the window's
  * streaming-friendly sort for per-group in-memory top-k state — the
  * right call for selective top-k (k << group size), which is what the
  * guarded pattern expresses. */
class GraftOptimizations extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => WindowTopKRewrite)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
