package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.cosine_sim

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Two paths:
  *  - [[bruteForce]]: one scan + TakeOrdered top-k — the exactness
  *    baseline; O(n·d) per query, no shuffle of the table.
  *  - IVF ([[buildIvf]] / [[searchIvf]]): k-means coarse quantizer; the
  *    table is written partitioned by cluster id, so a query scans only
  *    `nprobe` clusters — at 100 TB this is the difference between a
  *    full-table scan and touching `nprobe/k` of the data (with
  *    partition pruning doing the skipping via the `cluster` column).
  */
object Ann {

  final case class IvfIndex(centers: Array[Array[Float]], assigned: DataFrame)

  private val toVec = udf((a: Seq[Float]) =>
    Vectors.dense(a.map(_.toDouble).toArray))

  /** Fit a k-means coarse quantizer and assign every row to its
    * nearest centroid. `assigned` keeps the original columns plus
    * `cluster` — persist with `.write.partitionBy("cluster")` so
    * searches prune partitions. */
  def buildIvf(df: DataFrame, embCol: String, k: Int, seed: Long = 42L): IvfIndex = {
    val featured = df.withColumn("__features", toVec(col(embCol)))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("cluster")
      .fit(featured)
    val assigned = model.transform(featured).drop("__features")
    val centers = model.clusterCenters.map(_.toArray.map(_.toFloat))
    IvfIndex(centers, assigned)
  }

  /** Exact brute-force cosine top-k (baseline; also the in-cluster
    * scorer for IVF). */
  def bruteForce(df: DataFrame, embCol: String, query: Array[Float],
      topK: Int): DataFrame = {
    val qLit = typedLit(query.toSeq)
    df.withColumn("score", cosine_sim(col(embCol), qLit))
      .orderBy(col("score").desc)
      .limit(topK)
  }

  /** IVF search: rank centroids by cosine to the query (driver-side —
    * centers are k·d floats, trivially small), scan only the best
    * `nprobe` clusters, brute-force within. */
  def searchIvf(index: IvfIndex, embCol: String, query: Array[Float],
      topK: Int, nprobe: Int): DataFrame = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probed = index.centers.zipWithIndex
      .sortBy { case (c, _) => -cos(c, query) }
      .take(nprobe).map(_._2)
    bruteForce(
      index.assigned.filter(col("cluster").isin(probed.toIndexedSeq.map(Integer.valueOf): _*)),
      embCol, query, topK)
  }
}
