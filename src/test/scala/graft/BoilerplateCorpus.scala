package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial boilerplate corpus for the Σdf² skew-guard specs (r16
  * verdict orders #1/#2): every 10th document shares one 4-token
  * boilerplate sentence, so the shingle inverted index gets two hot
  * keys with df = n/10 while every other shingle is doc-unique. The
  * plain shash self-join would put df² candidate pairs on ONE reducer
  * key — the exact shape `Scale.blockedSelfJoinPairs` exists to
  * defuse. Schema mirrors the driver fixtures' documents table. */
object BoilerplateCorpus {
  val BoilerSentence = "please call us now"

  /** Write an n-doc documents.parquet under java.io.tmpdir (stable
    * per-(n, period) path, overwritten on rerun) and return the corpus
    * dir. `period` selects which docs carry the boilerplate sentence
    * (doc_id % period == 0). The default 10 drives the self-join
    * miner specs; the incremental-dedup specs use a period COPRIME to
    * the entry's shard selector (doc_id % 10) so boilerplate docs land
    * on BOTH sides of the shard-vs-corpus join — with period 10 the
    * hot shingle would exist only on the shard side and the inner
    * join would never see the skew. */
  def write(spark: SparkSession, n: Long, period: Int = 10): String = {
    val suffix = if (period == 10) "" else s"_p$period"
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_boiler_$n$suffix"
    val uniq = (0 until 18).map(j => format_string(s"d%dt$j", col("doc_id")))
    spark.range(n).select(col("id").as("doc_id"))
      .withColumn("text", concat_ws(" ",
        uniq :+ when(col("doc_id") % period === 0, lit(BoilerSentence))
          .otherwise(format_string("tail%d alpha beta", col("doc_id"))): _*))
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}
