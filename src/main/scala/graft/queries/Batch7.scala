package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.Catalog.{Q, events, table}

/** Query batch 7: feature normalization (per-group z-score), value
  * histograms, funnel conversion, and edit-distance near-dup
  * verification — the remaining standard blocks of a training-data /
  * product-analytics pipeline.
  */
object Batch7 {

  private val d4 = DecimalType(18, 4)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(d4)
  private def decSql(c: String) = s"CAST($c AS DECIMAL(18,4))"

  /** Persist the generator-declared MJPEG frame layout once per
    * corpus dir (media_id, frame_no, frame_len) — the
    * [[Batch13.persistCentersOnce]] contract: skip the rewrite when
    * the persisted rows already match, so repeat runs never delete
    * part files out from under a concurrent reader. The check-then-
    * overwrite is serialized per JVM only (the memo set below): fine
    * under the single-process bench/verify contract this shares with
    * persistCentersOnce; if multi-process runs over one corpus dir
    * ever become possible, switch to write-temp-then-atomic-rename
    * (ADVICE r15). */
  private val mjpegLayoutPersisted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()
  private def persistMjpegLayoutOnce(s: org.apache.spark.sql.SparkSession,
      path: String, rows: IndexedSeq[(Long, Long, Long)]): Unit = {
    import s.implicits._
    val key = (path, rows.hashCode)
    if (mjpegLayoutPersisted.contains(key)) return
    val upToDate = try {
      s.read.parquet(path).orderBy("media_id", "frame_no").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toIndexedSeq == rows
    } catch { case _: Exception => false }
    if (!upToDate)
      rows.toDF("media_id", "frame_no", "frame_len")
        .coalesce(1).write.mode("overwrite").parquet(path)
    mjpegLayoutPersisted.add(key)
  }

  val entries: Seq[(String, Q)] = Seq(

    // ---- per-group z-score normalization. Mean and variance come from
    // exact decimal sums (sum, sum-of-squares, count) so both engines
    // aggregate identical values in any partition order; the final
    // (x - mean)/stddev runs in correctly-rounded double arithmetic on
    // those identical inputs, then one safety quantization. Variance
    // uses the population formula E[x²] − E[x]² explicitly — stddev()
    // builtins differ in formula (samp/pop) and summation order across
    // engines. One aggregation + one broadcast-size dimension join; no
    // window over the full table needed.
    "zscore_by_type" -> Q(
      (s, dir) => {
        val stats = events(s, dir).groupBy("event_type")
          .agg(
            sum(dec(col("value"))).cast("double").as("sv"),
            sum((dec(col("value")) * dec(col("value")))
              .cast(DecimalType(38, 8))).cast("double").as("svv"),
            count(lit(1)).cast("double").as("n"))
          .select(col("event_type"), (col("sv") / col("n")).as("mean"),
            sqrt((col("svv") / col("n")) - (col("sv") / col("n")) * (col("sv") / col("n")))
              .as("sd"))
        events(s, dir).join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"),
            ((col("value") - col("mean")) / col("sd"))
              .cast(DecimalType(18, 8)).cast("double").as("z"))
          .orderBy("event_id")
      },
      Some(s"""WITH stats AS (
              |  SELECT event_type,
              |    CAST(sum(${decSql("value")}) AS DOUBLE) AS sv,
              |    CAST(sum(CAST(${decSql("value")} * ${decSql("value")} AS DECIMAL(38,8))) AS DOUBLE) AS svv,
              |    CAST(count(*) AS DOUBLE) AS n
              |  FROM events GROUP BY event_type)
              |SELECT event_id, event_type,
              |  CAST(CAST((value - sv / n) /
              |    sqrt(svv / n - (sv / n) * (sv / n)) AS DECIMAL(18,8)) AS DOUBLE) AS z
              |FROM events JOIN stats USING (event_type)
              |ORDER BY event_id""".stripMargin),
      "per-group z-score normalization (decimal-exact moments, broadcast stats join)"),

    // ---- fixed-width value histogram per event type: floor(value/50)
    // buckets — one partial-aggregated groupBy, the shape that scales
    // to any row count (bucket cardinality is bounded, map-side
    // combine collapses everything early).
    "histogram_values" -> Q(
      (s, dir) => {
        events(s, dir)
          .groupBy(col("event_type"),
            floor(col("value") / 50.0d).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "bucket")
      },
      Some("""SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bucket,
             |  count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin),
      "fixed-width per-type value histogram (bounded-cardinality partial agg)"),

    // ---- funnel conversion: per user, did a click ever precede a
    // purchase? Expressed as per-user min event times (one partial
    // aggregation over (user, type) pairs — NOT a window over raw
    // events) then a conditional count. Total order (ts, event_id)
    // breaks ties deterministically via the micros+id tuple.
    "funnel_click_purchase" -> Q(
      (s, dir) => {
        val perUser = events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "click",
              struct(unix_micros(col("ts")).as("us"), col("event_id"))))
              .as("first_click"),
            min(when(col("event_type") === "purchase",
              struct(unix_micros(col("ts")).as("us"), col("event_id"))))
              .as("first_purchase"))
        perUser.select(
          count(lit(1)).as("users"),
          count(col("first_click")).as("clicked"),
          count(col("first_purchase")).as("purchased"),
          count(when(col("first_click").isNotNull &&
            col("first_purchase").isNotNull &&
            (col("first_click.us") < col("first_purchase.us") ||
              (col("first_click.us") === col("first_purchase.us") &&
                col("first_click.event_id") < col("first_purchase.event_id"))),
            lit(1))).as("converted"))
      },
      Some("""WITH per_user AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'click'
             |      THEN (epoch_us(CAST(ts AS TIMESTAMP)), event_id) END) AS first_click,
             |    min(CASE WHEN event_type = 'purchase'
             |      THEN (epoch_us(CAST(ts AS TIMESTAMP)), event_id) END) AS first_purchase
             |  FROM events WHERE event_type IN ('click', 'purchase')
             |  GROUP BY user_id)
             |SELECT count(*) AS users,
             |  count(first_click) AS clicked,
             |  count(first_purchase) AS purchased,
             |  count(CASE WHEN first_click IS NOT NULL AND first_purchase IS NOT NULL
             |    AND first_click < first_purchase THEN 1 END) AS converted
             |FROM per_user""".stripMargin),
      "click->purchase funnel conversion (per-user min-struct agg, no window)"),

    // ---- edit-distance near-dup verification: candidate pairs from a
    // cheap blocking key (shared 24-char prefix — an equi-join, the
    // blocking discipline every entity-resolution pipeline uses), then
    // exact levenshtein <= 15 on the candidates only. Both engines
    // implement standard unit-cost levenshtein. The self-join goes
    // through Scale.blockedSelfJoinPairs (round 12): content-derived
    // blocks are adversarially skewed (b docs sharing one boilerplate
    // opening = b² pairs on ONE key), so oversized blocks fan out over
    // triangle-distributed group pairs — bit-identical pair set (the
    // oracle stays the plain blocked join), bounded per-task work.
    "dedup_edit_distance" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            substring(col("text"), 1, 24).as("block"))
        // the levenshtein cut rides in `verify` so it is evaluated
        // once per DEDUPED candidate pair, after the cheap id/diagonal
        // conjuncts — a stacked .filter would be pushed into the join
        // ahead of them and run on every raw equi-match (the r12 bench
        // regression: 21× the levenshtein volume)
        graft.ops.Scale.blockedSelfJoinPairs(docs, "block", "doc_id",
            verify = levenshtein(col("text_a"), col("text_b")) <= 15)
          .withColumn("dist", levenshtein(col("text_a"), col("text_b")))
          .select(col("doc_id_a").as("doc_a"), col("doc_id_b").as("doc_b"),
            col("dist").cast("long").as("dist"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text, substring(text, 1, 24) AS block FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
             |FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
             |WHERE levenshtein(a.text, b.text) <= 15
             |ORDER BY doc_a, doc_b""".stripMargin),
      "edit-distance near-dups: prefix-blocked candidates, levenshtein verify-once"),

    // ---- skew levers ON the correctness gate: the salted two-phase
    // aggregation must equal the direct groupBy exactly. Decimal sums
    // make the partial/merge decomposition exact (double partials
    // would re-round per merge order); the oracle is the PLAIN
    // aggregation — the salt must be invisible in the result.
    "salted_agg" -> Q(
      (s, dir) => {
        graft.ops.Scale.saltedSumCount(
          events(s, dir).withColumn("v", dec(col("value"))),
          Seq("event_type"), "v", buckets = 8)
          .select(col("event_type"), col("sum_v").cast("double").as("sum_value"),
            col("n"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type,
              |  CAST(sum(${decSql("value")}) AS DOUBLE) AS sum_value,
              |  count(*) AS n
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      "salted two-phase aggregation == direct groupBy (skew lever, oracled)"),

    // ---- salted join equality: replicating the small side across
    // salts must not change inner-join semantics. Oracle is the plain
    // join + aggregation.
    "salted_join" -> Q(
      (s, dir) => {
        val joined = graft.ops.Scale.saltedJoin(
          table(s, dir, "orders"),
          table(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
          key = "o_custkey", buckets = 4)
        joined
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n,
              |  CAST(sum(${decSql("o_totalprice")}) AS DOUBLE) AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "salted equi-join == plain join (single-hot-key skew lever, oracled)"),

    // ---- multimodal plumbing on the gate: the resize arithmetic
    // (aspect-preserving scale, the computation a real resizer does
    // before touching pixels) over the fake dims derived from the
    // binary column. Double division/multiply are correctly-rounded
    // IEEE on identical inputs → floor agrees bit-for-bit.
    "mm_resize" -> Q(
      (s, dir) => {
        val meta = table(s, dir, "documents")
          .withColumn("n_bytes", length(col("text").cast("binary")))
          .select(col("doc_id"),
            (col("n_bytes") % 640).as("fake_width"),
            (col("n_bytes") % 480).as("fake_height"))
          .filter(col("fake_width") > 0 && col("fake_height") > 0)
        graft.ops.Multimodal.resizeMeta(meta, 320, 240)
          .select(col("doc_id"), col("fake_width"), col("fake_height"),
            col("out_width"), col("out_height"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, fake_width, fake_height,
             |  CAST(greatest(floor(fake_width * s), 1) AS INT) AS out_width,
             |  CAST(greatest(floor(fake_height * s), 1) AS INT) AS out_height
             |FROM (
             |  SELECT doc_id, fake_width, fake_height,
             |    least(320.0 / fake_width, 240.0 / fake_height, 1.0) AS s
             |  FROM (
             |    SELECT doc_id,
             |      octet_length(CAST(text AS BLOB)) % 640 AS fake_width,
             |      octet_length(CAST(text AS BLOB)) % 480 AS fake_height
             |    FROM documents)
             |  WHERE fake_width > 0 AND fake_height > 0)
             |ORDER BY doc_id""".stripMargin),
      "multimodal resize arithmetic (aspect-preserving) on the oracle gate"),

    // ---- frame sampling: Multimodal.sampleFrames' slicing layout
    // (evenly-spaced byte windows standing in for decoded frames) is
    // pure arithmetic on lengths — re-derived in SQL, so the
    // mapPartitions plumbing's row explosion and offsets are
    // hash-verified, not just spec'd.
    "mm_frames" -> Q(
      (s, dir) => {
        val media = table(s, dir, "documents")
          .select(col("doc_id").as("media_id"), col("text").cast("binary").as("media"))
        graft.ops.Multimodal.sampleFrames(media, 4)
          .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
            length(col("frame_bytes")).cast("long").as("frame_len"))
          .orderBy("media_id", "frame_no")
      },
      Some("""WITH d AS (
             |  SELECT doc_id AS media_id,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |f AS (
             |  SELECT media_id, len, unnest(range(4)) AS frame_no,
             |    greatest(len // 4, 1) AS step
             |  FROM d)
             |SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
             |  least(least(frame_no * step, greatest(len - 1, 0)) + step, len)
             |    - least(frame_no * step, greatest(len - 1, 0)) AS frame_len
             |FROM f ORDER BY media_id, frame_no""".stripMargin),
      "multimodal frame-sampling offsets hash-verified (4 evenly-spaced byte windows)"),

    // ---- REAL image decode (round 12): per doc, synthesize a
    // deterministic PNG (pixel = hash(doc_id, x, y); lossless format,
    // JDK writer), then run the real ImageIO decode kernel over the
    // binary column — magic-byte sniff, BufferedImage decode, grid
    // pixel statistics. Rows-only gate (DuckDB can't decode PNGs);
    // MultimodalSpec asserts the exact dims/mime/feature invariants,
    // including JPEG and dirty-bytes fallback.
    "mm_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, graft.ops.Multimodal.syntheticPng(
              id, 8 + (id % 16).toInt, 8 + (id % 12).toInt))
          }).toDF("media_id", "media")
        graft.ops.Multimodal.extractImageFeatures(media).toDF()
          .select(col("media_id"), col("mime"), col("decoded"),
            col("width"), col("height"),
            round(element_at(col("feature"), 4).cast("double"), 6).as("mean_luma"),
            round(element_at(col("feature"), 7).cast("double"), 6).as("aspect"))
          .orderBy("media_id")
      },
      None,
      "real JDK ImageIO decode kernel over synthesized PNGs (rows-only: the float feature vector re-rounds per op and DuckDB cannot parse PNG; the decode itself is hash-gated by the integer-exact twin mm_decode_oracle)"),

    // ---- the REAL ImageIO decode kernel under the HARD oracle gate
    // (r12 verdict task 4): the synthetic PNG's pixel (x,y) is
    // mix64(doc_id ^ x<<32 ^ y) & 0xffffff, so DuckDB re-derives every
    // sampled channel value with pure integer arithmetic — no PNG
    // parsing — while the Spark side goes through the PNG encoder AND
    // the guarded ImageIO decoder. A single flipped bit anywhere in
    // encode → decode → 16×16 grid sampling breaks the hash match.
    // Channel sums stay exact Longs; mean_luma/aspect are ONE IEEE
    // division of exactly-representable integers in both engines, so
    // the driver's zero-tolerance float compare holds bit-for-bit.
    "mm_decode_oracle" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, graft.ops.Multimodal.syntheticPng(
              id, 8 + (id % 16).toInt, 8 + (id % 12).toInt))
          }).toDF("media_id", "media")
        graft.ops.Multimodal.extractImageExact(media).toDF()
          .select(col("media_id"), col("decoded"),
            col("width"), col("height"),
            col("sum_r"), col("sum_g"), col("sum_b"),
            ((lit(299L) * col("sum_r") + lit(587L) * col("sum_g")
              + lit(114L) * col("sum_b")).cast("double")
              / lit(65280000L).cast("double")).as("mean_luma"),
            (col("width").cast("double") / col("height")).as("aspect"))
          .orderBy("media_id")
      },
      Some {
        // splitmix64 finalizer stages in HUGEINT mod-2^64 arithmetic
        // (the simhash-oracle kernel, re-pointed at (seed, x, y))
        val m2 = Batch3.mixM2Sql
        val m3 = Batch3.mixM3Sql
        val fin = Batch3.mixFinSql
        s"""WITH docs AS (
           |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + doc_id % 12 AS h
           |  FROM documents),
           |grid AS (
           |  SELECT t1.range AS xi, t2.range AS yi
           |  FROM range(0, 16) t1 CROSS JOIN range(0, 16) t2),
           |px AS (
           |  SELECT d.doc_id, d.w, d.h,
           |    (g.xi * (d.w - 1)) // 15 AS x, (g.yi * (d.h - 1)) // 15 AS y
           |  FROM docs d CROSS JOIN grid g),
           |m1 AS (
           |  SELECT doc_id, w, h,
           |    (CAST(xor(xor(doc_id, x * 4294967296), y) AS HUGEINT)
           |      + 11400714819323198485) % 18446744073709551616 AS z
           |  FROM px),
           |m2 AS (SELECT doc_id, w, h, $m2 AS z FROM m1),
           |m3 AS (SELECT doc_id, w, h, $m3 AS z FROM m2),
           |pix AS (SELECT doc_id, w, h, ($fin) % 16777216 AS p FROM m3),
           |sums AS (
           |  SELECT doc_id, w, h,
           |    CAST(sum(p // 65536) AS BIGINT) AS sum_r,
           |    CAST(sum((p // 256) % 256) AS BIGINT) AS sum_g,
           |    CAST(sum(p % 256) AS BIGINT) AS sum_b
           |  FROM pix GROUP BY doc_id, w, h)
           |SELECT doc_id AS media_id, TRUE AS decoded,
           |  w AS width, h AS height, sum_r, sum_g, sum_b,
           |  CAST(299 * sum_r + 587 * sum_g + 114 * sum_b AS DOUBLE)
           |    / CAST(65280000 AS DOUBLE) AS mean_luma,
           |  CAST(w AS DOUBLE) / h AS aspect
           |FROM sums ORDER BY media_id""".stripMargin
      },
      "real ImageIO decode under the hash-matched gate: DuckDB re-derives the sampled grid's exact channel sums from the mix64 pixel formula (no PNG parsing)"),

    // ---- REAL audio decode (round 12): per doc, synthesize a
    // deterministic 16-bit PCM WAV (sample = hash(doc_id, i); byte-
    // exact hand-rolled RIFF writer), then run the real
    // javax.sound.sampled kernel over the binary column — magic-byte
    // sniff, streamed chunked PCM read, mono mix, signal statistics.
    // Rows-only gate (DuckDB can't parse WAV containers);
    // MultimodalSpec checks the statistics against closed-form sine
    // expectations and the dirty-bytes/stereo/AIFF paths.
    "mm_audio" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, graft.ops.Multimodal.syntheticWav(
              id, 8000, 64 + (id % 192).toInt, 1 + (id % 2).toInt))
          }).toDF("media_id", "media")
        graft.ops.Multimodal.extractAudioFeatures(media).toDF()
          .select(col("media_id"), col("mime"), col("decoded"),
            col("sample_rate"), col("channels"), col("n_frames"),
            round(col("duration_sec"), 6).as("duration_sec"),
            round(element_at(col("feature"), 1).cast("double"), 6).as("rms"),
            round(element_at(col("feature"), 3).cast("double"), 6).as("zcr"))
          .orderBy("media_id")
      },
      None,
      "real JDK PCM audio decode kernel over synthesized WAVs (rows-only: float signal stats re-round per op and DuckDB cannot parse RIFF; the decode itself is hash-gated by the integer-exact twin mm_audio_oracle)"),

    // ---- the REAL audio decode kernel under the HARD oracle gate
    // (r13 verdict task 2, the exact generalization of
    // mm_decode_oracle): the synthetic mono WAV's sample i is
    // mix64(doc_id ^ i) >>> 48 as signed 16-bit, so DuckDB re-derives
    // every sample with the same HUGEINT splitmix64 kernel — no RIFF
    // parsing — while the Spark side goes through the byte-exact WAV
    // writer AND the guarded javax.sound.sampled streaming decoder.
    // All aggregates are exact Longs (sum, sum of squares, peak,
    // zero-crossings with the zeros-skipped sign convention
    // decodeAudio's zcr uses); mean_sample is ONE IEEE division of
    // exactly-representable integers in both engines.
    "mm_audio_oracle" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, graft.ops.Multimodal.syntheticWav(
              id, 8000, 64 + (id % 64).toInt))
          }).toDF("media_id", "media")
        graft.ops.Multimodal.extractAudioExact(media).toDF()
          .select(col("media_id"), col("decoded"), col("sample_rate"),
            col("channels"), col("n_frames"), col("sum_samples"),
            col("sum_squares"), col("peak_abs"), col("zero_crossings"),
            (col("sum_samples").cast("double") /
              col("n_frames").cast("double")).as("mean_sample"))
          .orderBy("media_id")
      },
      Some {
        // splitmix64 finalizer stages in HUGEINT mod-2^64 arithmetic
        // (the mm_decode_oracle kernel, re-pointed at (doc_id ^ i))
        val m2 = Batch3.mixM2Sql
        val m3 = Batch3.mixM3Sql
        val fin = Batch3.mixFinSql
        s"""WITH docs AS (
           |  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
           |idx AS (
           |  SELECT d.doc_id, d.n, t.range AS i
           |  FROM docs d CROSS JOIN range(0, 128) t WHERE t.range < d.n),
           |m1 AS (
           |  SELECT doc_id, n, i,
           |    (CAST(xor(doc_id, i) AS HUGEINT)
           |      + 11400714819323198485) % 18446744073709551616 AS z
           |  FROM idx),
           |m2 AS (SELECT doc_id, n, i, $m2 AS z FROM m1),
           |m3 AS (SELECT doc_id, n, i, $m3 AS z FROM m2),
           |smp AS (
           |  SELECT doc_id, n, i,
           |    CAST(CASE WHEN t >= 32768 THEN t - 65536 ELSE t END AS BIGINT) AS s
           |  FROM (SELECT doc_id, n, i,
           |          ($fin) // 281474976710656 AS t FROM m3)),
           |sgn AS (
           |  SELECT doc_id, i,
           |    CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 END AS sg
           |  FROM smp WHERE s <> 0),
           |cr AS (
           |  SELECT doc_id, CAST(count(*) FILTER (
           |      WHERE prev IS NOT NULL AND sg <> prev) AS BIGINT) AS zc
           |  FROM (SELECT doc_id, sg,
           |          lag(sg) OVER (PARTITION BY doc_id ORDER BY i) AS prev
           |        FROM sgn)
           |  GROUP BY doc_id),
           |agg AS (
           |  SELECT doc_id, n,
           |    CAST(sum(s) AS BIGINT) AS sum_samples,
           |    CAST(sum(s * s) AS BIGINT) AS sum_squares,
           |    CAST(max(abs(s)) AS BIGINT) AS peak_abs
           |  FROM smp GROUP BY doc_id, n)
           |SELECT a.doc_id AS media_id, TRUE AS decoded,
           |  CAST(8000 AS BIGINT) AS sample_rate,
           |  CAST(1 AS BIGINT) AS channels,
           |  CAST(a.n AS BIGINT) AS n_frames,
           |  a.sum_samples, a.sum_squares, a.peak_abs,
           |  coalesce(c.zc, 0) AS zero_crossings,
           |  CAST(a.sum_samples AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_sample
           |FROM agg a LEFT JOIN cr c USING (doc_id)
           |ORDER BY media_id""".stripMargin
      },
      "real javax.sound.sampled decode under the hash-matched gate: DuckDB re-derives every PCM sample's exact integer aggregates from the mix64 formula (no RIFF parsing)"),

    // ---- modality ROUTER (round 12 capstone): a mixed binary corpus
    // (PNGs, WAVs, MJPEG clips, junk — one synthetic blob per doc,
    // modality by doc_id%4) routed by the O(1) magic-byte sniff, each
    // slice dispatched to its REAL kernel, per-row results unioned.
    // This is the 100-TB multimodal ingest shape: one cheap scan
    // partitions by modality BEFORE any decode is attempted, each
    // branch stays partition-local (no shuffle until the final gate
    // orderBy), and junk degrades to a counted 'unknown' row instead
    // of failing a task. 1-in-5 subsample. Rows-only gate.
    "mm_router" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val blob = (id % 4) match {
              case 0 => graft.ops.Multimodal.syntheticPng(id, 8 + (id % 8).toInt, 8)
              case 1 => graft.ops.Multimodal.syntheticWav(id, 8000, 64 + (id % 64).toInt)
              case 2 => graft.ops.Multimodal.syntheticMjpeg(id, 2 + (id % 3).toInt, 8, 8)
              case _ => s"junk-$id".getBytes("UTF-8")
            }
            (id, blob)
          }).toDF("media_id", "media")
        val routed = media.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            graft.ops.Multimodal.sniffMediaMime(bytes) match {
              case "image/png" =>
                val f = graft.ops.Multimodal.decodeImage(id, bytes)
                (id, "image", f.decoded, f.width.toLong)
              case "audio/wav" =>
                val f = graft.ops.Multimodal.decodeAudio(id, bytes)
                (id, "audio", f.decoded, f.n_frames)
              case "image/jpeg" =>
                // MJPEG sniffs as its first JPEG frame; a single-frame
                // "clip" IS a still photo (the most common real-corpus
                // image format), which must reach the image kernel,
                // not stop at a 1-frame video row (r12 review)
                val n = graft.ops.Multimodal.mjpegFrameOffsets(bytes).length
                if (n > 1) {
                  // decoded = "the PROBED frames actually decode" —
                  // first AND last (every = n-1 visits frames 0 and
                  // n-1), a deliberate two-point PROBE, not a full
                  // scan: a clip with valid markers but undecodable
                  // entropy at either end reports decoded=false, while
                  // interior-only corruption can still pass (r13
                  // advice: frame-0-only overstated the flag; the
                  // router stays the cheap dispatch pass, so it probes
                  // the two cheapest high-signal positions rather than
                  // decoding all n — mm_frames_real is the full-decode
                  // entry).
                  val probed = graft.ops.Multimodal
                    .sampleMjpegFrames(id, bytes, every = math.max(1, n - 1))
                    .toSeq
                  (id, "video", probed.nonEmpty && probed.forall(_.decoded),
                    n.toLong)
                } else {
                  val f = graft.ops.Multimodal.decodeImage(id, bytes)
                  (id, "image", f.decoded, f.width.toLong)
                }
              case _ => (id, "unknown", false, 0L)
            }
          }).toDF("media_id", "modality", "decoded", "units")
        routed.orderBy("media_id")
      },
      // behavioral oracle (r14): the fixture spec fully determines the
      // router's output — modality by doc_id%4, units by each
      // generator's size formula, decoded=true for every well-formed
      // blob — so DuckDB predicts the table WITHOUT decoding anything
      // while the Spark side must sniff-route and actually decode
      // (a misroute, a decode failure, or a wrong frame count breaks
      // the hash). Dirty-bytes degradation stays spec'd in
      // MultimodalSpec, where corruption can be injected per-row.
      Some("""SELECT doc_id AS media_id,
             |  CASE doc_id % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |    WHEN 2 THEN 'video' ELSE 'unknown' END AS modality,
             |  doc_id % 4 <> 3 AS decoded,
             |  CAST(CASE doc_id % 4 WHEN 0 THEN 8 + doc_id % 8
             |    WHEN 1 THEN 64 + doc_id % 64
             |    WHEN 2 THEN 2 + doc_id % 3 ELSE 0 END AS BIGINT) AS units
             |FROM documents WHERE doc_id % 5 = 0
             |ORDER BY media_id""".stripMargin),
      "modality router under the hash gate: magic-byte sniff dispatches a mixed corpus to the real image/audio/video kernels; DuckDB predicts the full routing table from the fixture spec"),

    // ---- REAL video frame sampling (round 12): per-doc synthetic
    // MJPEG clips (concatenated JPEGs — the one video format the JDK
    // decodes) through the real marker-scan + per-frame ImageIO
    // kernel. 1-in-5 subsample, every-2nd frame. Rows-only gate;
    // MultimodalSpec pins offsets/dims/fallbacks.
    "mm_frames_real" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, graft.ops.Multimodal.syntheticMjpeg(
              id, 2 + (id % 4).toInt, 8 + (id % 8).toInt, 8))
          }).toDF("media_id", "media")
        graft.ops.Multimodal.extractMjpegFrames(media, every = 2).toDF()
          .select(col("media_id"), col("frame_no"), col("decoded"),
            col("width"), col("height"), col("n_bytes"))
          .orderBy("media_id", "frame_no")
      },
      None,
      "real MJPEG frame sampling (marker scan + per-frame ImageIO decode; rows-only: JPEG entropy coding is engine-specific, so pixel stats can't cross-derive — the segmentation itself is hash-gated by mm_frames_oracle)"),

    // ---- the MJPEG SEGMENTATION under the HARD oracle gate (r14
    // verdict task 3): frame count, byte offsets, and sampled-frame
    // byte lengths are deterministic byte arithmetic over the fixture,
    // so they gate exactly — the GENERATOR-declared per-frame encoded
    // lengths persist as a per-corpus-dir artifact (the persisted-fit
    // pattern the tuner oracles use), and DuckDB re-derives count /
    // offsets / the every-2nd sampling cut from them by prefix-sum
    // arithmetic, while the Spark side runs the REAL segment walker
    // over the CONCATENATED bytes. Any walker defect — a payload FFD8
    // miscounted as a frame start, a skipped-segment length misread,
    // an off-by-one boundary — shifts an offset or the count and
    // breaks the hash. Per-frame PIXEL stats stay rows-only in
    // mm_frames_real: JPEG is lossy and the decoder's IDCT rounding is
    // engine-specific, so no cross-engine pixel derivation exists.
    "mm_frames_oracle" -> Q(
      (s, dir) => {
        import s.implicits._
        def gen(id: Long) = graft.ops.Multimodal.syntheticMjpegWithLayout(
          id, 2 + (id % 4).toInt, 8 + (id % 8).toInt, 8)
        val ids = table(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
        // generator ground truth, driver-side (bounded by the 1-in-5
        // subsample; the same deliberate bounded-collect contract as
        // the persisted centroid fits)
        val layout = ids.collect().sorted.toIndexedSeq.flatMap { id =>
          gen(id)._2.zipWithIndex.map { case (l, f) =>
            (id, f.toLong, l.toLong) }
        }
        persistMjpegLayoutOnce(s, Batch13.artifactPath("mjpeg_layout", dir),
          layout)
        val media = ids.mapPartitions(_.map(id => (id, gen(id)._1)))
          .toDF("media_id", "media")
        graft.ops.Multimodal.extractMjpegFrames(media, every = 1).toDF()
          .withColumn("n_frames",
            count(lit(1)).over(Window.partitionBy(col("media_id"))))
          .filter(col("frame_no") % 2 === 0) // the every=2 sampling cut
          .select(col("media_id"), col("n_frames").cast("long"),
            col("frame_no").cast("long"),
            col("byte_offset").cast("long"),
            col("n_bytes").cast("long").as("frame_len"))
          .orderBy("media_id", "frame_no")
      },
      Some(s"""WITH layout AS (
             |  SELECT media_id, frame_no, frame_len
             |  FROM read_parquet('${Batch13.MjpegLayoutPathToken}/*.parquet')),
             |ofs AS (
             |  SELECT media_id, frame_no, frame_len,
             |    CAST(count(*) OVER (PARTITION BY media_id) AS BIGINT)
             |      AS n_frames,
             |    CAST(coalesce(sum(frame_len) OVER (PARTITION BY media_id
             |      ORDER BY frame_no
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS byte_offset
             |  FROM layout)
             |SELECT media_id, n_frames, frame_no, byte_offset,
             |  CAST(frame_len AS BIGINT) AS frame_len
             |FROM ofs WHERE frame_no % 2 = 0
             |ORDER BY media_id, frame_no""".stripMargin),
      "MJPEG segmentation under the hash-matched gate: the real marker walker's frame count/offsets/lengths must equal prefix sums over the generator-declared layout artifact"),

    // ---- REAL audio resample (round 12): synthesize per-doc WAVs at
    // mixed rates/channels (some already mono@8k -> byte-identical
    // passthrough, the rest resampled), prove outputs by re-decoding
    // with the real kernel at the target rate. Same 1-in-5 subsample
    // discipline as mm_resize_real. Rows-only gate; MultimodalSpec
    // holds the closed-form signal checks.
    "mm_resample" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val rate = if (id % 2 == 0) 8000 else 16000
            (id, graft.ops.Multimodal.syntheticWav(
              id, rate, 64 + (id % 128).toInt, 1 + (id % 3 % 2).toInt))
          }).toDF("media_id", "media")
        graft.ops.Multimodal.resampleAudios(media, 8000)
          .map { r =>
            val back = graft.ops.Multimodal.decodeAudio(r.media_id, r.out_bytes)
            (r.media_id, r.resampled, r.changed, r.in_rate, r.in_channels,
              r.in_frames, r.out_frames, back.sample_rate, back.n_frames)
          }.toDF("media_id", "resampled", "changed", "in_rate", "in_channels",
            "in_frames", "out_frames", "back_rate", "back_frames")
          .orderBy("media_id")
      },
      None,
      "real streaming audio resample round-tripped through the real decoder (rows-only: this view reports float-domain round-trip stats; the resample kernel itself is hash-gated by the integer-exact twin mm_resample_oracle)"),

    // ---- the REAL resample kernel under the HARD oracle gate (r13
    // verdict task 4): mono hash-sample WAVs at 4k/8k/16k resampled to
    // 8 kHz — the 8k slice exercises the normalized-passthrough
    // branch, the others the streaming linear interpolation — then the
    // OUTPUT WAV re-decoded by decodeAudioExact into exact integer
    // aggregates. DuckDB re-runs the interpolation itself: same
    // splitmix64 source samples, same IEEE expression tree
    // (srcPos = j·(inRate/8000.0), frac = srcPos − floor(srcPos),
    // s = s0·(1−frac) + s1·frac on the /32768.0-normalized values),
    // and the PINNED portable rounding floor(s·32767.0 + 0.5) with the
    // [-32768,32767] clamp — every IEEE add/mul/floor is correctly
    // rounded per the standard, so identical expression shape means
    // bit-identical doubles in both engines, and the aggregates
    // compare as exact Longs under the zero-tolerance gate.
    "mm_resample_oracle" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val rate = ((id % 3).toInt: @annotation.switch) match {
              case 0 => 8000
              case 1 => 4000
              case _ => 16000
            }
            (id, graft.ops.Multimodal.syntheticWav(
              id, rate, 64 + (id % 64).toInt))
          }).toDF("media_id", "media")
        graft.ops.Multimodal.resampleAudios(media, 8000)
          .map { r =>
            val e = graft.ops.Multimodal.decodeAudioExact(
              r.media_id, r.out_bytes)
            (r.media_id, r.resampled, r.changed, r.in_rate.toLong,
              r.in_frames, e.sample_rate, e.n_frames, e.sum_samples,
              e.sum_squares, e.peak_abs, e.zero_crossings)
          }.toDF("media_id", "resampled", "changed", "in_rate",
            "in_frames", "out_rate", "out_frames", "sum_samples",
            "sum_squares", "peak_abs", "zero_crossings")
          .orderBy("media_id")
      },
      Some {
        val m2 = Batch3.mixM2Sql
        val m3 = Batch3.mixM3Sql
        val fin = Batch3.mixFinSql
        s"""WITH docs AS (
           |  SELECT doc_id, 64 + doc_id % 64 AS n,
           |    CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 4000
           |      ELSE 16000 END AS rate
           |  FROM documents WHERE doc_id % 5 = 0),
           |idx AS (
           |  SELECT d.doc_id, d.n, d.rate, t.range AS i
           |  FROM docs d CROSS JOIN range(0, 128) t WHERE t.range < d.n),
           |m1 AS (
           |  SELECT doc_id, n, rate, i,
           |    (CAST(xor(doc_id, i) AS HUGEINT)
           |      + 11400714819323198485) % 18446744073709551616 AS z
           |  FROM idx),
           |m2 AS (SELECT doc_id, n, rate, i, $m2 AS z FROM m1),
           |m3 AS (SELECT doc_id, n, rate, i, $m3 AS z FROM m2),
           |smp AS (
           |  SELECT doc_id, n, rate, i,
           |    CAST(CASE WHEN t >= 32768 THEN t - 65536 ELSE t END AS BIGINT) AS s
           |  FROM (SELECT doc_id, n, rate, i,
           |          ($fin) // 281474976710656 AS t FROM m3)),
           |src AS (
           |  SELECT doc_id, n, rate, list(s ORDER BY i) AS ss
           |  FROM smp GROUP BY doc_id, n, rate),
           |outs AS (
           |  SELECT doc_id, i AS j, s AS o FROM smp WHERE rate = 8000
           |  UNION ALL
           |  SELECT doc_id, j,
           |    greatest(-32768, least(32767, CAST(floor(
           |      (CASE WHEN frac = 0 THEN CAST(ss[fp + 1] AS DOUBLE) / 32768.0
           |       ELSE (CAST(ss[fp + 1] AS DOUBLE) / 32768.0) * (1.0 - frac)
           |          + (CAST(ss[fp + 2] AS DOUBLE) / 32768.0) * frac END)
           |      * 32767.0 + 0.5) AS BIGINT))) AS o
           |  FROM (
           |    SELECT doc_id, n, ss, j,
           |      CAST(floor(srcPos) AS BIGINT) AS fp,
           |      srcPos - floor(srcPos) AS frac
           |    FROM (
           |      SELECT sr.doc_id, sr.n, sr.ss, t.range AS j,
           |        CAST(t.range AS DOUBLE)
           |          * (CAST(sr.rate AS DOUBLE) / CAST(8000 AS DOUBLE)) AS srcPos
           |      FROM src sr CROSS JOIN range(0, 256) t
           |      WHERE sr.rate <> 8000))
           |  WHERE (CASE WHEN frac = 0 THEN fp ELSE fp + 1 END) <= n - 1),
           |sgn AS (
           |  SELECT doc_id, j,
           |    CASE WHEN o > 0 THEN 1 WHEN o < 0 THEN -1 END AS sg
           |  FROM outs WHERE o <> 0),
           |cr AS (
           |  SELECT doc_id, CAST(count(*) FILTER (
           |      WHERE prev IS NOT NULL AND sg <> prev) AS BIGINT) AS zc
           |  FROM (SELECT doc_id, sg,
           |          lag(sg) OVER (PARTITION BY doc_id ORDER BY j) AS prev
           |        FROM sgn)
           |  GROUP BY doc_id),
           |agg AS (
           |  SELECT doc_id,
           |    CAST(count(*) AS BIGINT) AS n_out,
           |    CAST(sum(o) AS BIGINT) AS sum_samples,
           |    CAST(sum(o * o) AS BIGINT) AS sum_squares,
           |    CAST(max(abs(o)) AS BIGINT) AS peak_abs
           |  FROM outs GROUP BY doc_id)
           |SELECT d.doc_id AS media_id, TRUE AS resampled,
           |  d.rate <> 8000 AS changed,
           |  CAST(d.rate AS BIGINT) AS in_rate,
           |  CAST(d.n AS BIGINT) AS in_frames,
           |  CAST(8000 AS BIGINT) AS out_rate,
           |  a.n_out AS out_frames,
           |  a.sum_samples, a.sum_squares, a.peak_abs,
           |  coalesce(c.zc, 0) AS zero_crossings
           |FROM docs d JOIN agg a USING (doc_id)
           |LEFT JOIN cr c USING (doc_id)
           |ORDER BY media_id""".stripMargin
      },
      "real streaming resample under the hash-matched gate: DuckDB re-runs the pinned IEEE interpolation + floor(x+0.5) rounding over mix64 source samples and compares exact integer aggregates of the output stream"),

    // ---- REAL pixel resize (round 12): synthesize per-doc PNGs (half
    // above, half within the 12x10 bound by construction), run the
    // real Graphics2D bilinear resize, then prove the output bytes by
    // re-decoding them with the real kernel — dims must match the
    // shared fitWithin arithmetic, passthroughs byte-identical.
    // Rows-only gate; MultimodalSpec holds the pixel-statistics checks.
    // Deterministic 1-in-5 doc subsample: each kept row costs ~4
    // ImageIO passes (synth encode, guarded decode, re-encode,
    // decode-back), and the full population benched 8.8 s at sf0.1
    // for a demo whose correctness is per-row — the subsample keeps
    // both dim populations and every code path at a fifth the cost.
    "mm_resize_real" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, graft.ops.Multimodal.syntheticPng(
              id, 6 + (id % 16).toInt, 5 + (id % 12).toInt))
          }).toDF("media_id", "media")
        val resized = graft.ops.Multimodal.resizeImages(media, 12, 10)
        resized.map { r =>
          val back = graft.ops.Multimodal.decodeImage(r.media_id, r.out_bytes)
          (r.media_id, r.changed, r.in_width, r.in_height,
            r.out_width, r.out_height, back.width, back.height)
        }.toDF("media_id", "changed", "in_w", "in_h",
            "out_w", "out_h", "back_w", "back_h")
          .orderBy("media_id")
      },
      None,
      "real bilinear raster resize round-tripped through the real decoder (rows-only gate; perf variant — the hash-gated sibling is mm_resize_oracle)"),

    // ---- the REAL resize kernel under the HARD oracle gate (r14
    // verdict task 2, closing the last real image kernel without a
    // hash-green sibling): hand-rolled bilinear under the PINNED
    // rounding contract documented at Multimodal.bilinearResize —
    // corner-aligned `rx=(w-1)/(ow-1)`, corners by floor/min, the
    // exact convex-combination association, floor(v+0.5) — then the
    // OUTPUT PNG is re-decoded and full-raster channel sums emitted
    // as exact Longs. DuckDB re-runs the whole chain from the mix64
    // pixel formula: fitWithin dims, the same IEEE geometry and
    // interpolation tree (correctly-rounded ops + identical
    // association = bit-identical doubles), the same rounding — no
    // PNG parsing, yet one flipped bit anywhere in
    // decode → interpolate → encode → re-decode breaks the match.
    // Within-bounds images take the passthrough branch (sums over the
    // original raster); the 8..23 × 8..19 dim population under the
    // 12×10 bound exercises both. Same 1-in-5 subsample as
    // mm_resize_real (~4 ImageIO passes per row).
    "mm_resize_oracle" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, graft.ops.Multimodal.syntheticPng(
              id, 8 + (id % 16).toInt, 8 + (id % 12).toInt))
          }).toDF("media_id", "media")
        graft.ops.Multimodal.resizeImagesExact(media, 12, 10).toDF()
          .select(col("media_id"), col("resized"), col("changed"),
            col("in_width"), col("in_height"),
            col("out_width"), col("out_height"),
            col("sum_r"), col("sum_g"), col("sum_b"))
          .orderBy("media_id")
      },
      Some {
        val m2 = Batch3.mixM2Sql
        val m3 = Batch3.mixM3Sql
        val fin = Batch3.mixFinSql
        // one interpolated channel under the pinned tree — the
        // association mirrors Multimodal.bilinearResize token-for-token
        def bl(c: String): String =
          s"""CAST(floor((p00.$c * (1.0 - c.fx) + p10.$c * c.fx)
             |      * (1.0 - c.fy)
             |    + (p01.$c * (1.0 - c.fx) + p11.$c * c.fx) * c.fy
             |    + 0.5) AS BIGINT)""".stripMargin
        s"""WITH docs AS (
           |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + doc_id % 12 AS h
           |  FROM documents WHERE doc_id % 5 = 0),
           |od AS (
           |  SELECT doc_id, w, h,
           |    greatest(CAST(floor(CAST(w AS DOUBLE) * s) AS INTEGER), 1) AS ow,
           |    greatest(CAST(floor(CAST(h AS DOUBLE) * s) AS INTEGER), 1) AS oh
           |  FROM (SELECT doc_id, w, h,
           |      least(least(CAST(12 AS DOUBLE) / CAST(w AS DOUBLE),
           |        CAST(10 AS DOUBLE) / CAST(h AS DOUBLE)),
           |        CAST(1.0 AS DOUBLE)) AS s
           |    FROM docs)),
           |grid AS (
           |  SELECT t1.range AS x, t2.range AS y
           |  FROM range(0, 23) t1 CROSS JOIN range(0, 19) t2),
           |m1 AS (
           |  SELECT d.doc_id, g.x, g.y,
           |    (CAST(xor(xor(d.doc_id, g.x * 4294967296), g.y) AS HUGEINT)
           |      + 11400714819323198485) % 18446744073709551616 AS z
           |  FROM od d JOIN grid g ON g.x < d.w AND g.y < d.h),
           |m2 AS (SELECT doc_id, x, y, $m2 AS z FROM m1),
           |m3 AS (SELECT doc_id, x, y, $m3 AS z FROM m2),
           |px AS (
           |  SELECT doc_id, x, y,
           |    p // 65536 AS r, (p // 256) % 256 AS g, p % 256 AS b
           |  FROM (SELECT doc_id, x, y, ($fin) % 16777216 AS p FROM m3)),
           |pass AS (
           |  SELECT d.doc_id,
           |    CAST(sum(p.r) AS BIGINT) AS sum_r,
           |    CAST(sum(p.g) AS BIGINT) AS sum_g,
           |    CAST(sum(p.b) AS BIGINT) AS sum_b
           |  FROM od d JOIN px p USING (doc_id)
           |  WHERE d.ow = d.w AND d.oh = d.h GROUP BY d.doc_id),
           |og AS (
           |  SELECT d.doc_id, d.w, d.h, g.x AS ox, g.y AS oy,
           |    CASE WHEN d.ow = 1 THEN CAST(0.0 AS DOUBLE)
           |      ELSE CAST(d.w - 1 AS DOUBLE) / CAST(d.ow - 1 AS DOUBLE)
           |    END AS rx,
           |    CASE WHEN d.oh = 1 THEN CAST(0.0 AS DOUBLE)
           |      ELSE CAST(d.h - 1 AS DOUBLE) / CAST(d.oh - 1 AS DOUBLE)
           |    END AS ry
           |  FROM od d JOIN grid g ON g.x < d.ow AND g.y < d.oh
           |  WHERE d.ow <> d.w OR d.oh <> d.h),
           |geo AS (
           |  SELECT doc_id, ox, oy, w, h,
           |    CAST(ox AS DOUBLE) * rx AS sx,
           |    CAST(oy AS DOUBLE) * ry AS sy
           |  FROM og),
           |corners AS (
           |  SELECT doc_id, ox, oy,
           |    CAST(floor(sx) AS INTEGER) AS x0,
           |    least(CAST(floor(sx) AS INTEGER) + 1, w - 1) AS x1,
           |    CAST(floor(sy) AS INTEGER) AS y0,
           |    least(CAST(floor(sy) AS INTEGER) + 1, h - 1) AS y1,
           |    sx - floor(sx) AS fx, sy - floor(sy) AS fy
           |  FROM geo),
           |ip AS (
           |  SELECT c.doc_id,
           |    ${bl("r")} AS r, ${bl("g")} AS g, ${bl("b")} AS b
           |  FROM corners c
           |  JOIN px p00 ON p00.doc_id = c.doc_id
           |    AND p00.x = c.x0 AND p00.y = c.y0
           |  JOIN px p10 ON p10.doc_id = c.doc_id
           |    AND p10.x = c.x1 AND p10.y = c.y0
           |  JOIN px p01 ON p01.doc_id = c.doc_id
           |    AND p01.x = c.x0 AND p01.y = c.y1
           |  JOIN px p11 ON p11.doc_id = c.doc_id
           |    AND p11.x = c.x1 AND p11.y = c.y1),
           |rs AS (
           |  SELECT doc_id, CAST(sum(r) AS BIGINT) AS sum_r,
           |    CAST(sum(g) AS BIGINT) AS sum_g,
           |    CAST(sum(b) AS BIGINT) AS sum_b
           |  FROM ip GROUP BY doc_id),
           |u AS (SELECT * FROM pass UNION ALL SELECT * FROM rs)
           |SELECT d.doc_id AS media_id, TRUE AS resized,
           |  (d.ow <> d.w OR d.oh <> d.h) AS changed,
           |  CAST(d.w AS INTEGER) AS in_width,
           |  CAST(d.h AS INTEGER) AS in_height,
           |  d.ow AS out_width, d.oh AS out_height,
           |  u.sum_r, u.sum_g, u.sum_b
           |FROM od d JOIN u USING (doc_id)
           |ORDER BY media_id""".stripMargin
      },
      "real hand-rolled bilinear resize under the hash-matched gate: DuckDB re-runs fitWithin, the pinned IEEE interpolation tree, and floor(v+0.5) over mix64 pixels and compares exact channel sums of the re-decoded output PNG"),

    // ---- corpus bigram-LM scoring: mean log P(w2|w1) per document,
    // with P = c(bigram)/c(unigram w1) over the whole corpus (history
    // counts include doc-final tokens; a simple consistent convention,
    // mirrored in the oracle). The quality-filtering primitive of
    // every LLM data pipeline ("drop the bottom decile by LM score").
    // Shapes: two corpus-count aggregations (map-side combined), then
    // equi-joins from the per-doc bigram stream to the count tables —
    // never a cross join; joins stay on the bigram/token strings
    // because hashing the GROUP key could merge colliding n-grams and
    // diverge from the oracle. Each ln is quantized to DECIMAL(18,8)
    // before the exact per-doc sum (double sums re-round per merge
    // order), mean re-quantized.
    "lm_bigram_score" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        // raw bigrams WITH multiplicity (no dedup — LM counts repeats,
        // unlike the dedup shingles); one-pass codegen'd kernel, and
        // short docs yield zero bigrams instead of the [1,0] index the
        // old sequence(1, greatest(n-1, 0)) HOF produced under ANSI
        val bigrams = docs.select(col("doc_id"),
          explode(graft.functions.word_grams(col("text"), 2)).as("bg"))
        val bgCounts = bigrams.groupBy("bg").agg(count(lit(1)).as("c_bg"))
        val uniCounts = docs
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c_uni"))
        bigrams
          .join(bgCounts, "bg")
          .withColumn("tok", split(col("bg"), " ").getItem(0))
          .join(uniCounts, "tok")
          .withColumn("lp",
            log(col("c_bg").cast("double") / col("c_uni"))
              .cast(DecimalType(18, 8)))
          .groupBy("doc_id")
          // mean stays RAW double: sum is an exact decimal (identical
          // in both engines) and one IEEE division of identical inputs
          // is bitwise deterministic — re-quantizing here would CREATE
          // ties (sums are exact 1e-8 multiples divided by small n,
          // and the engines break half-way rounding differently)
          .agg((sum(col("lp")).cast("double") / count(lit(1)))
            .as("lm_score"),
            count(lit(1)).as("n_bigrams"))
          .orderBy("doc_id")
      },
      Some("""WITH bigrams AS (
             |  SELECT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
             |    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')))
             |    AS bg
             |  FROM documents),
             |bg_counts AS (SELECT bg, count(*) AS c_bg FROM bigrams GROUP BY bg),
             |uni_counts AS (
             |  SELECT tok, count(*) AS c_uni FROM (
             |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             |  GROUP BY tok)
             |SELECT doc_id,
             |  CAST(sum(lp) AS DOUBLE) / count(*) AS lm_score,
             |  count(*) AS n_bigrams
             |FROM (
             |  SELECT doc_id,
             |    CAST(ln(CAST(c_bg AS DOUBLE) / c_uni) AS DECIMAL(18,8)) AS lp
             |  FROM bigrams
             |  JOIN bg_counts USING (bg)
             |  JOIN uni_counts ON string_split(bg, ' ')[1] = tok)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "per-doc corpus bigram-LM mean log-prob (LLM quality-filter primitive)"),

    // ---- CDC apply-with-tombstones: materialize final state from a
    // change feed — latest change per key wins, and a tombstone as the
    // latest change REMOVES the key (the delete half of the reference's
    // CDC semantics, mongo.go:23-41 operation_type; 'error' events
    // stand in for deletes on the fixture feed). One window, one
    // filter — the batch shape of KvEngine/StatefulKv materialization.
    "cdc_apply" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .filter(col("event_type") =!= "error") // tombstone: key deleted
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type, value FROM (
             |  SELECT user_id, event_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1 AND event_type <> 'error'
             |ORDER BY user_id""".stripMargin),
      "CDC apply with tombstones: latest-per-key minus deleted keys"),

    // ---- relative-rank windows: percent_rank/cume_dist are ratios of
    // integer ranks — one IEEE division of identical ints per row, so
    // no decimal quantization is needed. (ts, event_id) keeps the
    // order total (fixture ties on value exist).
    "win_percent_rank" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        events(s, dir)
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .select(col("event_id"), col("event_type"), col("pr"), col("cd"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type,
             |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
             |ORDER BY event_id""".stripMargin),
      "percent_rank + cume_dist relative-rank windows"),

    // ---- per-group Pearson correlation of value vs event time, from
    // decimal-exact moments (corr() builtins accumulate doubles in
    // partition order — non-deterministic across engines). Time is
    // centered to epoch-seconds-since-2024 so the decimal products
    // stay well inside DECIMAL(38,6).
    "corr_by_type" -> Q(
      (s, dir) => {
        val base = events(s, dir).select(col("event_type"),
          dec(col("value")).as("x"),
          ((unix_micros(col("ts")) - lit(1704067200000000L)) / lit(1000000L))
            .cast(DecimalType(18, 4)).as("t"))
        base.groupBy("event_type")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("x")).cast("double").as("sx"),
            sum(col("t")).cast("double").as("st"),
            // products run in DOUBLE (identical quantized inputs → one
            // identical IEEE multiply) then quantize for the exact sum:
            // DuckDB's DECIMAL(18)xDECIMAL(18) multiply overflows int64
            sum((col("x").cast("double") * col("x").cast("double"))
              .cast(DecimalType(38, 6))).cast("double").as("sxx"),
            sum((col("t").cast("double") * col("t").cast("double"))
              .cast(DecimalType(38, 6))).cast("double").as("stt"),
            sum((col("x").cast("double") * col("t").cast("double"))
              .cast(DecimalType(38, 6))).cast("double").as("sxt"))
          .select(col("event_type"),
            ((col("sxt") / col("n") - (col("sx") / col("n")) * (col("st") / col("n"))) /
              (sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))) *
               sqrt(col("stt") / col("n") - (col("st") / col("n")) * (col("st") / col("n")))))
              .cast(DecimalType(18, 8)).cast("double").as("pearson_r"))
          .orderBy("event_type")
      },
      Some("""WITH m AS (
             |  SELECT event_type,
             |    CAST(count(*) AS DOUBLE) AS n,
             |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(t) AS DOUBLE) AS st,
             |    CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             |    CAST(sum(CAST(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS stt,
             |    CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(t AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS sxt
             |  FROM (
             |    SELECT event_type, CAST(value AS DECIMAL(18,4)) AS x,
             |      CAST((epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) / 1000000.0
             |        AS DECIMAL(18,4)) AS t
             |    FROM events)
             |  GROUP BY event_type)
             |SELECT event_type,
             |  CAST(CAST(
             |    (sxt / n - (sx / n) * (st / n)) /
             |    (sqrt(sxx / n - (sx / n) * (sx / n)) *
             |     sqrt(stt / n - (st / n) * (st / n)))
             |  AS DECIMAL(18,8)) AS DOUBLE) AS pearson_r
             |FROM m ORDER BY event_type""".stripMargin),
      "per-group Pearson r from decimal-exact moments (corr() builtins are order-dependent)"),
  )
}
