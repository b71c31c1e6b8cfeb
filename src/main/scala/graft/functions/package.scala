package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.GraftSql

/** Public column API over the custom Catalyst expressions, plus SQL
  * function registration. Usage mirrors `org.apache.spark.sql.functions`:
  *
  * {{{
  *   import graft.functions._
  *   df.select(json_upper($"payload"), fnv64($"key"))
  * }}}
  */
package object functions {
  private def expr(c: Column): Expression = GraftSql.expression(c)
  private def col(e: Expression): Column = GraftSql.column(e)

  /** Recursively uppercase every string value in a JSON document. */
  def json_upper(c: Column): Column = col(JsonUpper(expr(c)))

  /** FNV-1a 64-bit hash of a string's UTF-8 bytes. */
  def fnv64(c: Column): Column = col(Fnv64(expr(c)))

  /** splitmix64 finalizer over a long column (full avalanche). */
  def mix64(c: Column): Column = col(Mix64(expr(c)))

  /** Polynomial rolling-hash fingerprint (mod 2^61-1). */
  def poly_hash(c: Column): Column = col(PolyHash(expr(c)))

  /** MinHash signature: array of k 64-bit minimums over a token array. */
  def minhash_sig(c: Column, k: Int): Column = col(MinHashSig(expr(c), k))

  /** SimHash-64 fingerprint over a token array. */
  def simhash64(c: Column): Column = col(SimHash64(expr(c)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = col(Hamming64(expr(a), expr(b)))

  /** Cosine similarity between two array<float> vectors. */
  def cosine_sim(a: Column, b: Column): Column = col(CosineSim(expr(a), expr(b)))

  /** Dot product between two array<float> vectors. */
  def dot_product(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))

  /** l2-normalized array<double> copy of an array<float> embedding. */
  def unit_vec(c: Column): Column = col(UnitVec(expr(c)))

  /** Random-hyperplane LSH bits for an array<float> vector. */
  def rp_bits(c: Column, nBits: Int, seed: Long): Column =
    col(RpBits(expr(c), nBits, seed))

  def word_shingles(c: Column, k: Int): Column = col(WordShingles(expr(c), k))

  def word_grams(c: Column, k: Int, stride: Int = 1): Column =
    col(WordGrams(expr(c), k, stride))

  /** Index of the max-cosine centroid (first wins ties); centers ride
    * as a plan reference object, codegen-safe at any k. */
  def argmax_cosine(c: Column, centers: Array[Array[Float]]): Column =
    col(ArgMaxCosine(expr(c), centers))

  /** Two-level assignment: global id `cell * k2 + argmax_j` over
    * `centers(cell)`; sub-centers ride as a plan reference object. */
  def argmax_cosine_cell(v: Column, cell: Column,
      centers: Array[Array[Array[Float]]]): Column =
    col(ArgMaxCosineCell(expr(v), expr(cell), centers))

  /** Cosine against centroid `cluster` of a center table; centers ride
    * as a plan reference object, codegen-safe at any k (the scoring
    * twin of [[argmax_cosine]]). */
  def centroid_cosine(v: Column, cluster: Column,
      centers: Array[Array[Float]]): Column =
    col(CentroidCosine(expr(v), expr(cluster), centers))

  def pq_encode(c: Column, centers: Array[Array[Array[Float]]]): Column =
    col(PqEncode(expr(c), centers))

  def pq_adc_score(c: Column, dotLut: Array[Array[Double]],
      normLut: Array[Array[Double]], qNorm: Double): Column =
    col(PqAdcScore(expr(c), dotLut, normLut, qNorm))

  /** UUIDv7-style time-ordered id (the reference pins UUIDv7 for job
    * ids so that id sort order ≈ arrival order —
    * `/root/reference/internal/models/job.go:15,86-88`): 48-bit
    * unix-millis hex prefix, version nibble 7, random tail spliced
    * from `uuid()`. Lexicographic order of ids therefore follows
    * creation time at millisecond resolution, with the random tail
    * breaking ties arbitrarily within a batch. */
  def uuid_v7(): Column = {
    import org.apache.spark.sql.functions._
    val tsHex = lpad(lower(hex(unix_millis(current_timestamp()))), 12, "0")
    val u = org.apache.spark.sql.functions.expr("uuid()")
    concat(
      substring(tsHex, 1, 8), lit("-"), substring(tsHex, 9, 4),
      lit("-7"), substring(u, 16, 3),
      lit("-"), substring(u, 20, 4),
      lit("-"), substring(u, 25, 12))
  }

  /** Register the scalar functions for SQL use (`SELECT fnv64(x) ...`). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("json_upper", es => JsonUpper(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("fnv64", es => Fnv64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("poly_hash", es => PolyHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming64", es => Hamming64(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
    def litK(e: Expression, fn: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument must be an integer literal, got $other")
    }
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es(0), litK(es(1), "word_shingles")), "scala_udf")
    reg.createOrReplaceTempFunction("word_grams",
      es => WordGrams(es(0), litK(es(1), "word_grams"),
        if (es.size > 2) litK(es(2), "word_grams") else 1), "scala_udf")
  }
}
