package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions._

/** Spark-native deployment hook: registers the graft scalar functions
  * into EVERY session at builder time, so a plain
  * `spark-sql --conf spark.sql.extensions=graft.GraftExtensions` (or a
  * Thrift/Connect server) can run `SELECT fnv64(x), cosine_sim(a, b)`
  * with no programmatic `registerAll` call. Same Expression instances
  * as the programmatic path — injectFunction only changes WHERE the
  * registration happens (builder vs session), not what executes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("json_upper", "json_upper(json) - recursively uppercases JSON string values",
      es => JsonUpper(es.head)),
    ("fnv64", "fnv64(str) - FNV-1a 64-bit hash (reference partitioner parity)",
      es => Fnv64(es.head)),
    ("poly_hash", "poly_hash(str) - polynomial rolling hash mod 2^61-1",
      es => PolyHash(es.head)),
    ("simhash64", "simhash64(array<string>) - SimHash-64 fingerprint",
      es => SimHash64(es.head)),
    ("hamming64", "hamming64(a, b) - Hamming distance of two 64-bit fingerprints",
      es => Hamming64(es(0), es(1))),
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays",
      es => CosineSim(es(0), es(1))),
    ("dot_product", "dot_product(a, b) - dot product of two float arrays",
      es => DotProduct(es(0), es(1))),
    // Parameterized expressions: the size/seed arguments are plan-time
    // constants of the Scala API, so in SQL they must arrive as
    // foldable literals and are extracted here at resolution time.
    ("minhash_sig", "minhash_sig(array<string>, k) - k-wise MinHash signature",
      es => MinHashSig(es.head, litInt(es(1), "minhash_sig", "k"))),
    ("word_shingles", "word_shingles(text, k) - distinct word k-shingles, one byte pass",
      es => WordShingles(es.head, litInt(es(1), "word_shingles", "k"))),
    ("word_grams", "word_grams(text, k[, stride]) - k-grams with multiplicity at a stride",
      es => WordGrams(es.head, litInt(es(1), "word_grams", "k"),
        if (es.size > 2) litInt(es(2), "word_grams", "stride") else 1)),
    ("rp_bits", "rp_bits(array<float>, n_bits, seed) - random-projection LSH bits",
      es => RpBits(es.head, litInt(es(1), "rp_bits", "n_bits"),
        litLong(es(2), "rp_bits", "seed"))),
    // Aggregates: the analyzer wraps a bare AggregateFunction returned
    // from a registry builder in an AggregateExpression itself.
    ("heavy_hitters", "heavy_hitters(col, k) - Misra-Gries heavy hitters (agg)",
      es => HeavyHitters(es.head, litInt(es(1), "heavy_hitters", "k"))),
    ("top_k_by", "top_k_by(ord, id, k) - exact bounded top-k per group (agg)",
      es => BoundedTopK(Cast(es(0), DoubleType), Cast(es(1), LongType),
        litInt(es(2), "top_k_by", "k"))))

  /** SQL-literal extraction for plan-time constant arguments. */
  private def litInt(e: Expression, fn: String, arg: String): Int =
    litLong(e, fn, arg).toInt

  private def litLong(e: Expression, fn: String, arg: String): Long =
    if (e.foldable) e.eval() match {
      case n: Number => n.longValue
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be an integer literal, got $other")
    } else throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a literal, got ${e.sql}")

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
