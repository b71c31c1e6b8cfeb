package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.fnv64
import graft.queries.Catalog.{Q, table}

/** Query batch 12: the learned-tokenizer plane ([[graft.ops.Bpe]]) —
  * BPE merge learning over the corpus word-frequency table and the
  * distributed encode that turns documents into token streams, the
  * stage between cleaning/dedup and packing in an LLM data pipeline.
  *
  * bpe_train is a rows-only gate (the iterative byte-pair merge
  * learning loop is not expressible in DuckDB SQL); bpe_token_count
  * is HASH-MATCHED as of r14 — it persists the merge artifact and
  * DuckDB re-runs the greedy lowest-rank merge loop itself
  * ([[Batch13.bpeEncodeOracleSql]]). BpeSpec carries the fit's
  * correctness load:
  * a hand-derived Sennrich worked example, round-trip detokenization
  * over the fixture corpus, partitioning invariance, the
  * merge-prefix/monotone-token-count properties, and the deterministic
  * maxWords fit cut.
  *
  * Scale notes: training is ONE map-side-combined word-count
  * aggregation over the corpus plus a Zipf-bounded (count desc, word
  * asc, limit maxWords) driver fit — the same bounded-collect contract
  * as the IVF k-means fits; encode is partition-local `mapPartitions`
  * under a broadcast rank map with a per-partition memo, so the corpus
  * pass that matters at 100 TB has no shuffle at all. */
object Batch12 {

  /** One model per (sfDir, merges) per JVM: the gate runs both entries
    * and the bench repeats them; refitting an identical deterministic
    * model per execution would bench the fit three times over. The
    * fit is itself deterministic (BpeSpec), so memoization is
    * observationally pure. */
  private val modelMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), graft.ops.Bpe.BpeModel]()
  // cold-eviction hook for Bench's fit-rescue retry (hand-rolled memo,
  // so the SessionMemo constructor can't self-register it)
  SessionMemo.registerEvictor("bpeModel", () => modelMemo.clear())

  private[queries] def model(s: org.apache.spark.sql.SparkSession, dir: String,
      merges: Int): graft.ops.Bpe.BpeModel = {
    MemoTrack.record("bpeModel") // readership ledger, same as SessionMemo
    modelMemo.computeIfAbsent((dir, merges), _ =>
      graft.ops.Bpe.train(table(s, dir, "documents"), "text", merges))
  }

  /** Bench pre-touch hook — see [[Batch3.touchMemos]]. */
  def touchMemos(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    fitThunks(s, dir).foreach(_._2())

  /** See [[Batch3.fitThunks]]. Name follows the mechanical
    * `fit_<memo label>` convention [[MemoTrack]] documents. */
  def fitThunks(s: org.apache.spark.sql.SparkSession, dir: String)
      : Seq[(String, () => Unit)] =
    Seq("fit_bpe_model" -> (() => { model(s, dir, 160); () }))

  val entries: Seq[(String, Q)] = Seq(

    // ---- learned merge table: the model artifact itself, in rank
    // order. Deterministic by the Bpe.train contract (exact word
    // count, totally-ordered fit cut, lexicographic tie-breaks).
    "bpe_train" -> Q(
      (s, dir) => {
        import s.implicits._
        model(s, dir, 160).merges.zipWithIndex
          .map { case ((l, r), i) => (i, l, r) }
          .toDF("rank", "left_sym", "right_sym")
          .orderBy("rank")
      },
      None,
      "BPE merge learning over the corpus word-frequency table (rows-only: the greedy fit is a stateful driver loop no SQL engine replays; the fitted model IS hash-gated end-to-end — bpe_encode_oracle re-derives every encoded token from the persisted merge table, and bpe_token_count gates counts over the same model)"),

    // ---- distributed encode: learned-subword token count per doc —
    // the budgeting input for pack_sequences/corpus_budget_* once a
    // real tokenizer replaces the whitespace/regex counters.
    "bpe_token_count" -> Q(
      (s, dir) => {
        val m = model(s, dir, 160)
        // persist the merge artifact (skip-if-matching) so the oracle
        // is self-sufficient under any entry subset: the recursive-CTE
        // re-derivation reads the persisted merges, and encoding with
        // the in-memory model gives the same answer by the save/load
        // identity bpe_encode_oracle proves
        Batch13.persistBpeOnce(s, dir, m)
        graft.ops.Bpe.tokenCounts(
            table(s, dir, "documents"), "doc_id", "text", m)
          .orderBy("doc_id")
      },
      Some(Batch13.bpeEncodeOracleSql),
      "distributed BPE encode under the broadcast rank map, HASH-MATCHED (r14): DuckDB re-runs the greedy lowest-rank merge loop over the persisted merge artifact"),

    // ---- deterministic training-order shuffle: the stage between
    // corpus selection and packing — every epoch reads documents in a
    // pseudorandom but REPRODUCIBLE order, sharded for parallel
    // writers. shard = fnv64('shuf-shard:'||id) % K routes each doc to
    // an output shard; pos = rank of a SECOND salted hash within the
    // shard gives the within-shard order. No rand() (survives task
    // retries and file re-splits), no global sort: at 100 TB this is
    // ONE shuffle by shard + a per-shard sort — the terasort shape,
    // with K scaling to cluster width (8 keeps sf fixtures
    // non-trivial). The two salts decorrelate routing from ordering
    // (one hash for both would order every shard identically by the
    // routing residue). Spark's signed Long hash view is matched in
    // the oracle by an explicit HUGEINT→two's-complement conversion
    // before the ORDER BY.
    "corpus_shuffle" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("shard"))
          .orderBy(col("ord"), col("doc_id"))
        table(s, dir, "documents")
          .withColumn("shard",
            pmod(fnv64(concat(lit("shuf-shard:"), col("doc_id"))), lit(8)))
          .withColumn("ord", fnv64(concat(lit("shuf-ord:"), col("doc_id"))))
          .withColumn("pos", row_number().over(w).cast("long"))
          .select(col("shard"), col("pos"), col("doc_id"), col("lang"))
          .orderBy("shard", "pos")
      },
      // the sample_weighted FNV-1a recursive-CTE kernel over BOTH
      // salted keys; shard via % 8 (power of two, signed/unsigned
      // agree), order via the two's-complement signed view of h so
      // DuckDB sorts exactly like Spark's Long
      Some("""WITH RECURSIVE k AS (
             |  SELECT 'shuf-shard:' || doc_id AS s FROM documents
             |  UNION
             |  SELECT 'shuf-ord:' || doc_id FROM documents),
             |fnv(s, i, h) AS (
             |  SELECT s, 1, CAST(14695981039346656037 AS HUGEINT) FROM k
             |  UNION ALL
             |  SELECT s, i+1,
             |    ((h - (h % 256) + CAST(xor(CAST(h % 256 AS BIGINT),
             |        CAST(unicode(substr(s, i, 1)) AS BIGINT)) AS HUGEINT))
             |      * 1099511628211) % 18446744073709551616
             |  FROM fnv WHERE i <= length(s)),
             |final AS (SELECT s, h FROM fnv WHERE i = length(s) + 1),
             |d AS (
             |  SELECT doc_id, lang,
             |    CAST(fs.h % 8 AS BIGINT) AS shard,
             |    CAST(fo.h - CASE WHEN fo.h >= CAST(9223372036854775808 AS HUGEINT)
             |      THEN CAST(18446744073709551616 AS HUGEINT)
             |      ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS ord
             |  FROM documents
             |  JOIN final fs ON fs.s = 'shuf-shard:' || doc_id
             |  JOIN final fo ON fo.s = 'shuf-ord:' || doc_id)
             |SELECT shard,
             |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) AS pos,
             |  doc_id, lang
             |FROM d ORDER BY shard, pos""".stripMargin),
      "deterministic sharded training-order shuffle (two salted hashes: route + order; retry-stable, terasort shape)")
  )
}
