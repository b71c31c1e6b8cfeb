package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding tokenizer: the tokenization stage of an
  * LLM training-data pipeline (the reference has only a whitespace
  * splitter — `internal/transform/transform.go` never tokenizes — so
  * this is a beyond-reference first-class component per the brief,
  * next to the "BPE-ish regex" token counter in
  * [[graft.functions.TextOps]]).
  *
  * Training follows the classic Sennrich et al. 2016 algorithm
  * (arXiv:1508.07909, "Neural Machine Translation of Rare Words with
  * Subword Units"), which learns merges over the WORD-FREQUENCY TABLE
  * rather than the raw corpus — the property that makes it
  * Spark-shaped at 100 TB:
  *
  *  1. DISTRIBUTED word count: one map-side-combined `groupBy(word)`
  *     aggregation over the corpus — the only pass that touches all
  *     the data, and it's the cheapest possible shape (no joins, no
  *     windows, partial aggregation before the single shuffle).
  *  2. BOUNDED fit: the top-`maxWords` (count desc, word asc — total
  *     order, so the cut is deterministic) rows collect to the
  *     driver. Zipf's law makes this a principled cut, not a hack: at
  *     web scale the top ~1M distinct words carry ~all token mass, and
  *     1M (word, count) rows are tens of MB — the same bounded-collect
  *     fit contract as [[Ann]]'s k-means (`Ann.scala` sampleTarget).
  *     Dropped tail words still ENCODE fine (they just never voted on
  *     merge ranks).
  *  3. DRIVER merge learning: `numMerges` greedy rounds over the word
  *     table (pair counts weighted by word frequency, merge the
  *     argmax; ties broken lexicographically so the learned model is a
  *     pure function of the corpus, never of partitioning). Incremental
  *     pair-count maintenance — only words containing the merged pair
  *     are re-scanned — keeps fit cost O(merges · touched symbols).
  *  4. DISTRIBUTED encode: the ~merges-sized rank map broadcasts to
  *     executors; encoding is partition-local `mapPartitions` with a
  *     per-partition word→tokens memo (Zipf again: the memo's hit rate
  *     approaches 1 on natural text, so per-row cost is amortized
  *     O(word length), not O(merges)).
  *
  * Words are whitespace-split and carry an end-of-word sentinel as a
  * separate final symbol, so merges never cross word boundaries and
  * detokenization is exact (concatenate, split on the sentinel).
  */
object Bpe {

  /** End-of-word sentinel symbol: a single space. Sennrich's paper
    * prints `</w>`, but any PRINTABLE sentinel is forgeable — a corpus
    * word like `</w>` itself would, after enough merges, fuse into a
    * symbol string-equal to the sentinel and corrupt detokenization
    * mid-word (r12 review). Words come from `split("\\s+")`, so a
    * whitespace character is the one thing PROVABLY absent from every
    * word — making the space sentinel unforgeable by construction, and
    * detokenization exact on any corpus, markup included. */
  val EndOfWord = " "

  /** Id 0 of every vocabulary: the unknown-symbol token. A character
    * never seen at FIT time has no learned id; mapping it to a
    * reserved unk id (instead of dropping or crashing) is what every
    * production tokenizer does with out-of-charset bytes. The INTERIOR
    * space makes it unforgeable (r12 review, same argument as
    * [[EndOfWord]]): merged symbols are concatenations of word
    * characters (never whitespace) with at most one trailing sentinel
    * space, so no learned symbol can ever contain a mid-string space —
    * while a plain "<unk>" could be fused verbatim from an
    * ML-preprocessed corpus that contains the literal string and
    * would collide with reserved id 0. */
  val UnkToken = "<unk >"

  /** A learned model: merge list in rank order (rank = learning
    * order; lower merges first at encode time), the fit-time
    * character set (the vocabulary's base alphabet), plus fit
    * provenance a 100 TB deployment wants auditable. */
  final case class BpeModel(
      merges: IndexedSeq[(String, String)],
      distinctWords: Long, fittedWords: Int, totalTokens: Long,
      baseChars: IndexedSeq[String] = IndexedSeq.empty) {
    /** rank lookup the encoder broadcasts: (left, right) -> rank */
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Deterministic token-id vocabulary: id 0 = [[UnkToken]], then
      * the sorted fit-time base alphabet (+ sentinel), then the
      * merged symbols in rank order — a pure function of the model,
      * so any two loads of the same artifact agree. Downstream
      * packing/batching consumes these ids, not strings. */
    lazy val vocab: Map[String, Int] = {
      val base = (baseChars.toSet + EndOfWord).toSeq.sorted
      val mergedSyms = merges.map { case (l, r) => l + r }
      // distinct: two merges can produce the SAME symbol string
      // (("a","bc") and ("ab","c") both yield "abc"); without dedup
      // zipWithIndex.toMap keeps only the last id and the id space
      // goes non-dense — an embedding table sized by vocab.size would
      // be smaller than max(id)+1 (r12 review). First occurrence wins,
      // ids stay dense 0..size-1.
      (UnkToken +: (base ++ mergedSyms)).distinct.zipWithIndex.toMap
    }
  }

  private def splitWords(text: String): Iterator[String] =
    if (text == null) Iterator.empty
    else text.split("\\s+").iterator.filter(_.nonEmpty)

  /** Initial symbol sequence of a word: one symbol per CODE POINT +
    * the end-of-word sentinel. Code points, not UTF-16 chars (r12
    * review): splitting an emoji's surrogate pair into two lone-
    * surrogate symbols would survive in-memory but be silently
    * replaced with '?' at every UTF-8 boundary (parquet save/load,
    * DataFrame string columns), so a reloaded model would encode
    * differently than the trained one on any emoji-bearing corpus. */
  private def initSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val out = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      out(i) = new String(Character.toChars(cps(i)))
      i += 1
    }
    out(cps.length) = EndOfWord
    out
  }

  /** Learn `numMerges` merges from the corpus' word-frequency table.
    *
    * Determinism contract (what the specs pin): the model is a pure
    * function of the multiset of words in `textCol` — repartitioning,
    * executor count, and row order never change it, because the word
    * count is an exact aggregation, the fit cut is totally ordered,
    * and every tie in pair counts breaks lexicographically. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1 << 20): BpeModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    // persisted across the two actions below (provenance agg + fit
    // cut): without it each action re-plans and the full corpus scan +
    // word-count shuffle — the expensive pass — runs twice (r12
    // review). The persisted frame is the aggregated word table
    // (|distinct words| rows), not the corpus.
    //
    // The word split is the codegen'd explode(split(…)) built-in, not
    // a typed Dataset.flatMap (r22, guide §1.2 step 2 / §4.1): the
    // closure path deserialized every row to a java String and broke
    // whole-stage codegen around the only full-corpus pass in the fit.
    // split(text, "\\s+") == String.split("\\s+") here modulo the
    // leading-empty-token edge (the SQL split keeps it, String.split
    // drops trailing only), which the same nonEmpty filter removes.
    val words = docs.select(col(textCol).cast("string").as("text"))
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val agg = words.agg(
        count(lit(1)).as("distinct_words"), sum("cnt").as("total")).head()
      val distinctWords = agg.getLong(0)
      val total = if (agg.isNullAt(1)) 0L else agg.getLong(1)
      // the bounded fit cut — deterministic total order before limit
      val fitted = words.orderBy(col("cnt").desc, col("word").asc)
        .limit(maxWords)
        .as[(String, Long)]
        .collect()
      learnMerges(fitted, numMerges, distinctWords, total)
    } finally words.unpersist()
  }

  /** The driver-side greedy loop, exposed for direct spec fixtures
    * (hand-checkable word tables à la Sennrich's worked example). */
  def learnMerges(wordCounts: Array[(String, Long)], numMerges: Int,
      distinctWords: Long = -1, totalTokens: Long = -1): BpeModel = {
    val words = wordCounts.map { case (w, c) =>
      (mutable.ArrayBuffer.from(initSymbols(w)), c)
    }
    // pair -> weighted count, plus pair -> word indexes containing it
    // (the incremental index: a merge only re-scans words it occurred in)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val (syms, c) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val n = pairCount.getOrElse(p, 0L) + sign * c
        if (n == 0L) pairCount.remove(p) else pairCount(p) = n
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        else pairWords.get(p).foreach { set =>
          // exact index maintenance (r12 review): leaving retracted
          // words registered made later rounds rescan words whose
          // occurrence of the pair an earlier merge already destroyed
          set -= wi
          if (set.isEmpty) pairWords.remove(p)
        }
        i += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      if (pairCount.isEmpty) done = true
      else {
        // argmax with lexicographic tie-break -> deterministic model
        var best: (String, String) = null
        var bestC = Long.MinValue
        pairCount.foreach { case (p, c) =>
          if (best == null || c > bestC || (c == bestC &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestC = c
          }
        }
        merges += best
        val merged = best._1 + best._2
        val touched = pairWords.remove(best).getOrElse(mutable.HashSet.empty)
        touched.foreach { wi =>
          val (syms, _) = words(wi)
          addWordPairs(wi, -1L) // retract this word's old pairs
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = merged
              syms.remove(i + 1)
            } else i += 1
          }
          addWordPairs(wi, 1L) // re-add under the new symbol sequence
        }
        round += 1
      }
    }
    BpeModel(merges.toIndexedSeq, distinctWords, wordCounts.length,
      totalTokens,
      // per code point, matching initSymbols (surrogate pairs intact)
      wordCounts.iterator.flatMap(
          _._1.codePoints().toArray.map(cp => new String(Character.toChars(cp))))
        .toSet.toIndexedSeq.sorted)
  }

  /** Encode one word with the standard greedy lowest-rank loop. Pure;
    * the distributed paths wrap it in a per-partition memo. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = mutable.ArrayBuffer.from(initSymbols(word))
    var go = syms.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) go = false
      else {
        syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
        syms.remove(bestAt + 1)
        go = syms.length > 1
      }
    }
    syms.toArray
  }

  /** Per-partition bounded memo around [[encodeWord]]: Zipf makes the
    * hit rate approach 1 on natural text; the size cap keeps executor
    * memory bounded on adversarial (all-distinct-words) corpora. */
  private final class Memo(ranks: Map[(String, String), Int], cap: Int) {
    private val m = new java.util.HashMap[String, Array[String]]()
    def encode(w: String): Array[String] = {
      val hit = m.get(w)
      if (hit != null) hit
      else {
        val enc = encodeWord(w, ranks)
        if (m.size < cap) m.put(w, enc)
        enc
      }
    }
  }

  private val MemoCap = 1 << 18

  /** Distributed encode: (id, tokens) per document. Partition-local
    * (`mapPartitions`, no shuffle); the rank map rides an explicit
    * broadcast so 1000 executors fetch it once each, not per task. */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.ranks)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new Memo(bc.value, MemoCap)
        it.map { case (id, text) =>
          (id, splitWords(text).flatMap(memo.encode).toArray)
        }
      }.toDF(idCol, "tokens")
  }

  /** Distributed encode to token IDS: (id, token_ids) per document —
    * what packing/batching actually consumes. Symbols outside the
    * fit-time vocabulary (unseen characters) map to [[UnkToken]]'s
    * id 0. Same partition-local broadcast-memo shape as
    * [[encodeDocs]]. */
  def encodeDocIds(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcRanks = spark.sparkContext.broadcast(model.ranks)
    val bcVocab = spark.sparkContext.broadcast(model.vocab)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new Memo(bcRanks.value, MemoCap)
        val vocab = bcVocab.value
        it.map { case (id, text) =>
          (id, splitWords(text)
            .flatMap(w => memo.encode(w).iterator.map(vocab.getOrElse(_, 0)))
            .toArray)
        }
      }.toDF(idCol, "token_ids")
  }

  /** Distributed token count per document — the budgeting/packing
    * input every pipeline stage downstream of tokenization consumes. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.ranks)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new Memo(bc.value, MemoCap)
        it.map { case (id, text) =>
          var n = 0L
          splitWords(text).foreach(w => n += memo.encode(w).length)
          (id, n)
        }
      }.toDF(idCol, "n_tokens")
  }

  /** Persist a learned model: the rank-ordered merge table plus fit
    * provenance as tiny parquet sidecars — the train-once/encode-many
    * deployment artifact (the tokenizer analogue of [[Ann.persistIvf]]:
    * a 100 TB pipeline fits the vocabulary once, then every later
    * job — including streaming encoders — loads it instead of
    * re-reading the corpus). */
  def save(model: BpeModel, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left_sym", "right_sym")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    Seq((model.distinctWords, model.fittedWords, model.totalTokens))
      .toDF("distinct_words", "fitted_words", "total_tokens")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    model.baseChars.toDF("ch")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/chars")
  }

  /** Load a persisted model. The merge list is rank-dense by
    * construction; a gap or duplicate rank means a corrupted artifact
    * and fails loudly rather than silently mis-encoding everything
    * downstream. */
  def load(spark: SparkSession, path: String): BpeModel = {
    import spark.implicits._
    val merges = spark.read.parquet(s"$path/merges")
      .select(col("rank").cast("int"), col("left_sym"), col("right_sym"))
      .as[(Int, String, String)]
      .collect().sortBy(_._1)
    merges.zipWithIndex.foreach { case ((r, _, _), i) =>
      require(r == i, s"Bpe.load: merge table at $path is not rank-dense " +
        s"(found rank $r at position $i) — corrupted or partially written artifact")
    }
    val meta = spark.read.parquet(s"$path/meta")
      .select(col("distinct_words").cast("long"), col("fitted_words").cast("int"),
        col("total_tokens").cast("long"))
      .as[(Long, Int, Long)].head()
    val chars = spark.read.parquet(s"$path/chars")
      .select(col("ch")).as[String].collect().toIndexedSeq.sorted
    BpeModel(merges.map { case (_, l, r) => (l, r) }.toIndexedSeq,
      meta._1, meta._2, meta._3, chars)
  }

  /** Exact detokenization of [[encodeDocs]] output: concatenate and
    * split on the end-of-word sentinel — exact on ANY corpus because
    * the whitespace sentinel cannot occur inside a word (see
    * [[EndOfWord]]). Round-trips the original text modulo whitespace
    * runs (specs assert equality against single-space-joined words). */
  def detokenize(tokens: Seq[String]): String =
    tokens.mkString("").split(java.util.regex.Pattern.quote(EndOfWord), -1)
      .iterator.filter(_.nonEmpty).mkString(" ")
}
