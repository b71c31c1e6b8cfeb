package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions. Every expression code-generates a call
  * to a JVM-static kernel (JsonOps / HashOps / VecOps), so they stay
  * inside whole-stage codegen rather than breaking the stage the way
  * interpreted fallbacks do. */

/** Recursive uppercase of all JSON string values (reference T4,
  * `/root/reference/internal/pipeline/pipeline.go:282-340`). */
case class JsonUpper(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    JsonOps.upperJson(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.JsonOps.upperJson($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
    code
  }
  override protected def withNewChildInternal(c: Expression): JsonUpper = copy(child = c)
  override def prettyName: String = "json_upper"
}

/** FNV-1a 64 over the UTF-8 bytes of a string (reference P2,
  * `/root/reference/internal/partitioner/hash.go:19-31`). */
case class Fnv64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.fnv64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.fnv64($c)")
  override protected def withNewChildInternal(c: Expression): Fnv64 = copy(child = c)
  override def prettyName: String = "fnv64"
}

/** splitmix64 finalizer over a long — the full-avalanche integer mix
  * every synthetic fixture and the KMV sketch share. Re-derivable in
  * external engines with pure mod-2^64 integer arithmetic (the
  * mm_decode_oracle HUGEINT kernel). */
case class Mix64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.mix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.mix64($c)")
  override protected def withNewChildInternal(c: Expression): Mix64 = copy(child = c)
  override def prettyName: String = "mix64"
}

/** Polynomial rolling-hash fingerprint of a string (mod 2^61-1). */
case class PolyHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.polyHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.polyHash($c)")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
  override def prettyName: String = "poly_hash"
}

/** Distinct word k-shingles straight from the text column — the
  * one-pass zero-join kernel (see [[TextOps.wordShingles]]); replaces
  * the split → slice → concat_ws HOF pipeline on the shingle-heavy
  * dedup/contamination queries while producing byte-identical arrays. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"word_shingles: k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextOps.wordShingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wordShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** Non-distinct k-grams with multiplicity at a token stride — the LM/
  * window sibling of [[WordShingles]] (see [[TextOps.wordGrams]]). */
case class WordGrams(child: Expression, k: Int, stride: Int = 1)
    extends UnaryExpression {
  require(k >= 1 && stride >= 1,
    s"word_grams: k and stride must be >= 1, got k=$k stride=$stride")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextOps.wordGrams(v.asInstanceOf[UTF8String], k, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wordGrams($c, $k, $stride)")
  override protected def withNewChildInternal(c: Expression): WordGrams = copy(child = c)
  override def prettyName: String = "word_grams"
}

/** MinHash signature (k 64-bit minimums) over an array<string> of
  * tokens/shingles. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.minHash(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.minHash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** SimHash-64 fingerprint over an array<string> of tokens. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.simHash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simHash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Hamming distance between two 64-bit fingerprints. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashOps.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 =
    copy(left = l, right = r)
  override def prettyName: String = "hamming64"
}

/** Cosine similarity between two array<float> embeddings (double
  * accumulation, deterministic element order). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Dot product between two array<float> embeddings. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** l2-normalize an array<float> embedding to an array<double> unit
  * vector (codegen'd; replaced the last Scala UDF in the library —
  * the k-means fit's feature prep, r11 finding 4). */
case class UnitVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VecOps.unitVec(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.unitVec($a)")
  override protected def withNewChildInternal(c: Expression): UnitVec =
    copy(child = c)
  override def prettyName: String = "unit_vec"
}

/** Argmax-cosine centroid assignment for an array<float> vector. The
  * k·d center floats ride as a plan REFERENCE OBJECT, not inlined
  * literals: at k=256, d=64 the literal form is ~16k constants whose
  * generated code grows with k·d toward the 64KB JVM method limit
  * (silent interpreted fallback past it), and any filter pushed
  * through the projection DUPLICATES the whole literal tree into the
  * scan's data filters. One kernel call keeps the scan a single
  * compact WholeStageCodegen span at any k. */
case class ArgMaxCosine(child: Expression, centers: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    VecOps.argmaxCosine(v.asInstanceOf[ArrayData], centers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argmaxCenters", centers, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.argmaxCosine($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): ArgMaxCosine = copy(child = c)
  override def prettyName: String = "argmax_cosine"
  // array fields compare by reference in the synthesized case-class
  // equals, which defeats subexpression elimination / plan
  // canonicalization for semantically identical kernels — compare the
  // center CONTENTS instead
  override def equals(other: Any): Boolean = other match {
    case a: ArgMaxCosine => child == a.child &&
      java.util.Arrays.deepEquals(
        centers.asInstanceOf[Array[AnyRef]], a.centers.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(centers.asInstanceOf[Array[AnyRef]])
}

/** Second-level assignment of a two-level quantizer: the global
  * cluster id `cell * k2 + argmax_j cos(v, subCenters(cell)(j))`. The
  * k1·k2·d sub-center floats ride as a plan reference object (see
  * [[ArgMaxCosine]] for why literals don't survive large k). */
case class ArgMaxCosineCell(left: Expression, right: Expression,
    centers: Array[Array[Array[Float]]])
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any, cell: Any): Any =
    VecOps.argmaxCosineCell(v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], centers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subCenters", centers, "float[][][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.VecOps.argmaxCosineCell($v, $c, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgMaxCosineCell =
    copy(left = l, right = r)
  override def prettyName: String = "argmax_cosine_cell"
  // content equality (see ArgMaxCosine)
  override def equals(other: Any): Boolean = other match {
    case a: ArgMaxCosineCell => left == a.left && right == a.right &&
      java.util.Arrays.deepEquals(
        centers.asInstanceOf[Array[AnyRef]], a.centers.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right,
      Int.box(java.util.Arrays.deepHashCode(centers.asInstanceOf[Array[AnyRef]])))
}

/** Cosine of an array<float> vector against centroid `cluster` of a
  * center table riding as a plan REFERENCE OBJECT — the scoring twin
  * of [[ArgMaxCosine]]. Replaces
  * `cosine_sim(v, element_at(typedLit(centers), cluster + 1))`, whose
  * literal form inlines all k·d center floats into the plan: with
  * SemDeDup-scale k (up to 2^20 centroids × d floats ≈ 256 MB) that
  * plan neither prints nor ships to executors, and any filter pushed
  * through the projection duplicates the whole literal tree. Results
  * are bit-identical to the literal form (same double arithmetic). */
case class CentroidCosine(left: Expression, right: Expression,
    centers: Array[Array[Float]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any, cluster: Any): Any =
    VecOps.centroidCosine(v.asInstanceOf[ArrayData],
      cluster.asInstanceOf[Int], centers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidCenters", centers, "float[][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.VecOps.centroidCosine($v, $c, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidCosine =
    copy(left = l, right = r)
  override def prettyName: String = "centroid_cosine"
  // content equality (see ArgMaxCosine)
  override def equals(other: Any): Boolean = other match {
    case a: CentroidCosine => left == a.left && right == a.right &&
      java.util.Arrays.deepEquals(
        centers.asInstanceOf[Array[AnyRef]], a.centers.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right,
      Int.box(java.util.Arrays.deepHashCode(centers.asInstanceOf[Array[AnyRef]])))
}

/** PQ encoding of an array<float>: m sub-codes of the nearest subspace
  * centroids. The codebook rides as a plan reference object (not an
  * inlined literal — m·256·dsub floats would blow the generated-code
  * constant pool), so the scan stays one codegen span. */
case class PqEncode(child: Expression, centers: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VecOps.pqEncode(v.asInstanceOf[ArrayData], centers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCenters", centers, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.pqEncode($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
  // content equality (see ArgMaxCosine)
  override def equals(other: Any): Boolean = other match {
    case a: PqEncode => child == a.child &&
      java.util.Arrays.deepEquals(
        centers.asInstanceOf[Array[AnyRef]], a.centers.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(centers.asInstanceOf[Array[AnyRef]])
}

/** ADC cosine estimate from a PQ code against per-query lookup tables
  * (computed driver-side per query: m·256 dot products). */
case class PqAdcScore(child: Expression, dotLut: Array[Array[Double]],
    normLut: Array[Array[Double]], qNorm: Double)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    VecOps.pqAdc(v.asInstanceOf[ArrayData], dotLut, normLut, qNorm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dRef = ctx.addReferenceObj("pqDotLut", dotLut, "double[][]")
    val nRef = ctx.addReferenceObj("pqNormLut", normLut, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecOps.pqAdc($c, $dRef, $nRef, ${qNorm}D)")
  }
  override protected def withNewChildInternal(c: Expression): PqAdcScore = copy(child = c)
  override def prettyName: String = "pq_adc_score"
  // content equality (see ArgMaxCosine)
  override def equals(other: Any): Boolean = other match {
    case a: PqAdcScore => child == a.child && qNorm == a.qNorm &&
      java.util.Arrays.deepEquals(
        dotLut.asInstanceOf[Array[AnyRef]], a.dotLut.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.deepEquals(
        normLut.asInstanceOf[Array[AnyRef]], a.normLut.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Double.box(qNorm),
      Int.box(java.util.Arrays.deepHashCode(dotLut.asInstanceOf[Array[AnyRef]])),
      Int.box(java.util.Arrays.deepHashCode(normLut.asInstanceOf[Array[AnyRef]])))
}

/** Random-hyperplane LSH bucket bits for an array<float> embedding. */
case class RpBits(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VecOps.rpBits(v.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.rpBits($c, $nBits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): RpBits = copy(child = c)
  override def prettyName: String = "rp_bits"
}
