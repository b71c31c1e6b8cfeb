package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
      es => DotProduct(es(0), es(1))))

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
