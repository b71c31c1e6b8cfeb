package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Batch3.{shingles, shinglesSql}
import graft.queries.Catalog.{Q, table}

/** Query batch 11: the online near-dup service completed (streaming
  * MinHash-LSH against a static corpus index) and single-pass dataset
  * profiling — the "what is in this corpus" primitive every
  * training-data pipeline runs before and after every transform.
  *
  * Scale notes:
  *  - the streaming LSH twin re-uses the batch plan's shapes: banded
  *    signatures are an equi-join on (band, band_hash) carrying ids
  *    only, candidates are verified exactly once after `distinct()`,
  *    and the static corpus side is the build-once artifact a 100-TB
  *    deployment would persist (here rebuilt per replay, cached).
  *  - the profile is ONE aggregation pass over the table (Spark's
  *    multi-distinct rewrite expands the input; at 100 TB swap the
  *    exact `countDistinct` for `approx_count_distinct` — the catalog
  *    ships that path as `approx_distinct`), then a `stack` of the
  *    single aggregated row into the long (column, stats) shape —
  *    nothing per-row ever reaches the driver.
  */
object Batch11 {

  private val MinhashK = 128
  private val MinhashBands = 32 // 4 rows/band → J>=0.8 missed w.p. ~5e-8

  /** (doc_id, sh, n_sh, sig) for a raw documents frame. */
  private[graft] def withSig(df: DataFrame): DataFrame = df
    .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
    .withColumn("n_sh", size(col("sh")))
    .withColumn("sig", graft.functions.minhash_sig(col("sh"), MinhashK))

  /** Banded view: one (doc_id, band, band_hash) row per band. */
  private[graft] def banded(df: DataFrame): DataFrame = {
    val r = MinhashK / MinhashBands
    val bandCols = (0 until MinhashBands).map(b =>
      xxhash64(concat_ws("_", slice(col("sig"), b * r + 1, r))))
    df.select(col("doc_id"), posexplode(array(bandCols: _*))
      .as(Seq("band", "band_hash")))
  }

  /** The per-micro-batch body of the streaming near-dup pair service:
    * band-join the ARRIVING docs' signatures against the static corpus
    * index (ids only), verify each distinct candidate pair exactly
    * once with true Jaccard, and emit (doc_a, doc_b, jaccard) with the
    * canonical doc_a < doc_b orientation. Asymmetric by design — the
    * online shape is "is this new doc a near-dup of the corpus", the
    * same contract as [[Batch9.incrementalKeeps]] but emitting the
    * matched PAIRS instead of the keep set. */
  private[graft] def minhashPairsVsCorpus(batch: DataFrame,
      corpusSig: DataFrame, corpusBanded: DataFrame,
      corpusBandSizes: Option[DataFrame] = None): DataFrame = {
    val shardSig = withSig(batch)
    // Asymmetric band join rides the GRID skew guard: a hot
    // (band, band_hash) bucket — boilerplate docs on both the arriving
    // shard and the corpus index — would put s·c candidates on one
    // reducer in the plain join. gridJoinPairs splits the bucket into
    // a gl×gr task grid with a bit-identical pair set (ScaleSpec), so
    // the exact-Jaccard oracle is untouched. The corpus side's bucket
    // sizes are part of the build-once index artifact (passed in,
    // cached) — no per-micro-batch re-aggregation of the corpus.
    val candidates = graft.ops.Scale.gridJoinPairs(
        banded(shardSig).select(col("doc_id").as("sid"), col("band"),
          col("band_hash")),
        corpusBanded.select(col("doc_id").as("bid"), col("band"),
          col("band_hash")),
        keyCols = Seq("band", "band_hash"), leftId = "sid", rightId = "bid",
        cap = 2048, rightSizes = corpusBandSizes)
      .select("sid", "bid").distinct()
    candidates
      .join(shardSig.select(col("doc_id").as("sid"), col("n_sh").as("ns"),
        col("sh").as("sh_s")), "sid")
      .join(corpusSig.select(col("doc_id").as("bid"), col("n_sh").as("nb"),
        col("sh").as("sh_b")), "bid")
      .select(col("sid"), col("bid"), col("ns"), col("nb"),
        size(array_intersect(col("sh_s"), col("sh_b"))).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("ns") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.8)
      .select(least(col("sid"), col("bid")).as("doc_a"),
        greatest(col("sid"), col("bid")).as("doc_b"), col("jaccard"))
  }

  val entries: Seq[(String, Q)] = Seq(

    // ---- the STREAMING MinHash-LSH near-dup twin on the oracle gate:
    // shard documents (doc_id % 10 == 0) stream against the static
    // rest-of-corpus band index; each micro-batch runs the banded
    // candidate join + verify-once and appends its pairs under the
    // applied-batchId marker discipline. Oracle = the EXACT Jaccard
    // cross-pairs (one side in the shard, one in the corpus) — LSH at
    // 32x4 bands misses a J>=0.8 pair w.p. ~5e-8, and the verify step
    // removes false positives exactly, so the stream's emitted pairs
    // hash-match the exact set.
    "dedup_minhash_stream" -> Q(
      (s, dir) => {
        // spreadScan: see Batch3.shingleDocs (r22, guide §2.5 input
        // skew) — corpus side only; micro-batches are already tiny
        val corpusSig = Reuse.cacheFresh("batch11.corpusSig", withSig(
          graft.ops.Scale.spreadScan(table(s, dir, "documents"), "doc_id")
            .filter(col("doc_id") % 10 =!= 0)))
        val corpusBanded = Reuse.cacheFresh("batch11.corpusBanded",
          banded(corpusSig))
        // per-bucket sizes are part of the build-once index artifact:
        // cached once, read by every micro-batch's grid skew guard
        val corpusBandSizes = Reuse.cacheFresh("batch11.corpusBandSizes",
          corpusBanded.groupBy(col("band"), col("band_hash"))
            .agg(count(lit(1)).as("__rn")))
        Catalog.replayToParquet(s, dir, "documents.parquet",
            xform = _.filter(col("doc_id") % 10 === 0),
            perBatch = batch =>
              minhashPairsVsCorpus(batch, corpusSig, corpusBanded,
                Some(corpusBandSizes)))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id, ${shinglesSql("string_split(text, ' ')", 3)} AS sh
              |  FROM documents)
              |SELECT doc_a, doc_b, jaccard FROM (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
              |WHERE jaccard >= 0.8 AND ((doc_a % 10 = 0) <> (doc_b % 10 = 0))
              |ORDER BY doc_a, doc_b""".stripMargin),
      "streaming MinHash-LSH near-dup pairs vs a static corpus band index (micro-batched band equi-join + verify-once; == exact cross-shard Jaccard pairs)"),

    // ---- single-pass dataset profile: per-column non-null count,
    // exact distinct, lexicographic min/max (as strings so the long
    // shape is uniform). One aggregation over the table, stack() of
    // the single result row — the schema-shaped "what changed in this
    // snapshot" check run before/after every corpus transform.
    "profile_columns" -> Q(
      (s, dir) => graft.ops.Profile.profile(table(s, dir, "documents"),
          Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("column_name"),
      Some("""SELECT 'doc_id' AS column_name, count(doc_id) AS non_nulls,
             |  count(DISTINCT doc_id) AS distinct_cnt,
             |  CAST(min(doc_id) AS VARCHAR) AS min_str,
             |  CAST(max(doc_id) AS VARCHAR) AS max_str FROM documents
             |UNION ALL
             |SELECT 'text', count(text), count(DISTINCT text),
             |  CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR) FROM documents
             |UNION ALL
             |SELECT 'lang', count(lang), count(DISTINCT lang),
             |  CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
             |UNION ALL
             |SELECT 'source', count(source), count(DISTINCT source),
             |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
             |UNION ALL
             |SELECT 'n_chars', count(n_chars), count(DISTINCT n_chars),
             |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
             |ORDER BY column_name""".stripMargin),
      "single-pass per-column dataset profile (non-null/distinct/min/max via one agg + stack; approx_distinct is the 100-TB distinct path)"))
}
