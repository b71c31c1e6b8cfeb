package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions._

class FunctionsSpec extends SparkTestBase {
  /** Minimal property runner over scalacheck Gen (scalatestplus isn't
    * a declared dep). */
  private def forAllSampled[A](gen: Gen[A], n: Int = 50)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }
  import spark.implicits._

  // -- FNV-1a 64: published test vectors --------------------------------
  test("fnv64 matches the FNV-1a 64 reference vectors") {
    assert(HashOps.fnv64("".getBytes("UTF-8")) === 0xcbf29ce484222325L)
    assert(HashOps.fnv64("a".getBytes("UTF-8")) === 0xaf63dc4c8601ec8cL)
    assert(HashOps.fnv64("foobar".getBytes("UTF-8")) === 0x85944171f73967e8L)
  }

  test("fnv64 column matches kernel and distributes across partitions") {
    val df = Seq("a", "b", "c", "foobar").toDF("s")
      .select($"s", fnv64($"s").as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("foobar") === 0x85944171f73967e8L)
    assert(got("a") === HashOps.fnv64("a".getBytes("UTF-8")))
  }

  // -- recursive JSON uppercase (FIXTURES.md A5) ------------------------
  test("json_upper uppercases string values only, recursively") {
    val in = """{"a":"x","n":1,"o":{"b":"y","arr":["z",{"c":"w"}]},"t":true,"nul":null}"""
    val out = Seq(in).toDF("j").select(json_upper($"j")).as[String].head()
    assert(out ===
      """{"a":"X","n":1,"o":{"b":"Y","arr":["Z",{"c":"W"}]},"t":true,"nul":null}""")
  }

  test("json_upper tolerates malformed/empty input as null") {
    val rows = Seq("not json", "", "{broken").toDF("j")
      .select(json_upper($"j")).as[String].collect()
    assert(rows.forall(_ == null))
  }

  test("json_upper is idempotent and preserves structure (property)") {
    val keyGen = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
    val strGen = Gen.alphaStr.map(_.take(10))
    val jsonGen = for {
      k1 <- keyGen; k2 <- keyGen.suchThat(_ != k1); v1 <- strGen; n <- Gen.chooseNum(-5, 5)
    } yield s"""{"$k1":"$v1","$k2":$n,"arr":["$v1",$n]}"""
    forAllSampled(jsonGen) { js =>
      val once = JsonOps.upperJson(
        org.apache.spark.unsafe.types.UTF8String.fromString(js))
      val twice = JsonOps.upperJson(once)
      assert(once != null)
      assert(once.toString === twice.toString) // idempotent
      // keys preserved (lowercase keys survive value-uppercasing)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val a = mapper.readTree(js); val b = mapper.readTree(once.toString)
      assert(a.properties().size === b.properties().size)
    }
  }

  // -- poly hash --------------------------------------------------------
  test("poly_hash is stable and collision-free on the fixture docs") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val n = docs.count()
    val distinctHashes = docs.select(poly_hash($"text")).distinct().count()
    assert(distinctHashes === n) // all 500 distinct texts → distinct fingerprints
    val h1 = docs.orderBy("doc_id").select(poly_hash($"text")).as[Long].head()
    val h2 = docs.orderBy("doc_id").select(poly_hash($"text")).as[Long].head()
    assert(h1 === h2)
  }

  // -- minhash ----------------------------------------------------------
  test("minhash signature estimates jaccard within tolerance (property-ish)") {
    def sig(tokens: Seq[String], k: Int): Array[Long] = {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      HashOps.minHash(new GenericArrayData(
        tokens.map(t => UTF8String.fromString(t)).toArray), k)
        .toLongArray()
    }
    val a = (1 to 100).map(i => s"tok$i")
    val b = (21 to 120).map(i => s"tok$i") // true jaccard = 80/120 = 0.667
    val (sa, sb) = (sig(a, 256), sig(b, 256))
    val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 0.667) < 0.1)
    // identical sets → identical signatures
    assert(sig(a, 64).toSeq === sig(a, 64).toSeq)
  }

  // -- simhash ----------------------------------------------------------
  test("simhash: near-identical token sets have small hamming distance") {
    def fp(tokens: Seq[String]): Long = {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      HashOps.simHash64(new GenericArrayData(
        tokens.map(t => UTF8String.fromString(t)).toArray))
    }
    val base = (1 to 200).map(i => s"w$i")
    val near = base.updated(0, "CHANGED").updated(1, "ALSO")
    val far = (1000 to 1200).map(i => s"w$i")
    assert(HashOps.hamming64(fp(base), fp(near)) <= 8)
    assert(HashOps.hamming64(fp(base), fp(far)) > 10)
  }

  // -- vector ops -------------------------------------------------------
  test("cosine_sim: self-similarity is clamped to 1, orthogonal is 0") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f))).toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b")).as[Double].collect()
    assert(got(0) === 1.0)
    assert(got(1) === 0.0)
    assert(got(2) === -1.0)
    assert(got(3) === 0.0) // zero-norm guard
  }

  test("rp_bits is deterministic and preserves locality") {
    val v = Array.tabulate(64)(i => math.sin(i).toFloat)
    val near = v.clone(); near(0) = near(0) + 0.001f
    val df = Seq(v, near).toDF("v").select(rp_bits($"v", 16, 42L)).as[Long].collect()
    assert(df(0) === df(1)) // tiny perturbation keeps the same bucket
  }

  // -- BoundedTopK: O(k)-buffer top-k-per-key aggregate -----------------

  test("top_k_by equals the window row_number plan on random skewed data") {
    val gen = for {
      key <- Gen.choose(0, 5)
      ord <- Gen.choose(-100, 100).map(_.toDouble)
    } yield (key, ord)
    val rows = (0 until 500).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).map {
        case (k, o) => (k, i.toLong, o)
      })
    val df = rows.toDF("key", "id", "ord").repartition(7) // multi-partition merge path
    val k = 3
    val got = df.groupBy($"key")
      .agg(graft.functions.BoundedTopK.top_k_by($"ord", $"id", k).as("top"))
      .select($"key", explode($"top").as("t"))
      .select($"key", $"t.id".as("id"), $"t.ord".as("ord"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"ord".desc, $"id")
    val want = df.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .select($"key", $"id", $"ord")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
  }

  test("top_k_by aggregates partially before the exchange (map-side combine)") {
    val df = (0 until 100).map(i => (i % 4, i.toLong, i.toDouble)).toDF("key", "id", "ord")
      .groupBy($"key")
      .agg(graft.functions.BoundedTopK.top_k_by($"ord", $"id", 2).as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial pass before the shuffle, like built-in aggregates
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  // -- approx_percentile: the sketch that replaces exact percentile at
  //    scale — mergeable, bounded memory; assert its documented rank
  //    error against the exact answer on the fixture ------------------

  test("approx_percentile tracks exact percentile within the accuracy bound") {
    val dir = sf("sf0.001")
    val ev = graft.queries.Catalog.events(spark, dir)
    val acc = 1000 // rank error <= n/acc
    val rows = ev.groupBy($"event_type").agg(
      expr("percentile(value, 0.5D)").as("exact"),
      expr(s"approx_percentile(value, 0.5D, $acc)").as("approx"),
      count(lit(1)).as("n"),
      expr("percentile(value, 0.02D)").as("lo"),
      expr("percentile(value, 0.98D)").as("hi")).collect()
    rows.foreach { r =>
      val (exact, approx) = (r.getDouble(1), r.getDouble(2))
      // rank error n/acc translates to a value window; on these sizes
      // (n ~ few thousand, acc=1000) approx must land between the 2nd
      // and 98th percentile — a loose but implementation-independent box
      assert(approx >= r.getDouble(4) && approx <= r.getDouble(5),
        s"${r.getString(0)}: approx $approx outside [${r.getDouble(4)}, ${r.getDouble(5)}]")
      assert(math.abs(approx - exact) <= (r.getDouble(5) - r.getDouble(4)),
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  // -- uuid_v7: time-ordered ids (reference job.go:15,86-88) ------------

  test("word_shingles is byte-identical to the split/slice/concat_ws HOF pipeline") {
    import spark.implicits._
    // the HOF formulation word_shingles replaced on the shingle queries
    def hof(text: org.apache.spark.sql.Column, k: Int) = {
      val tokens = split(text, " ")
      val last = size(tokens) - (k - 1)
      val idx = slice(sequence(lit(1), greatest(last, lit(1))),
        lit(1), greatest(last, lit(0)))
      array_distinct(transform(idx, i => concat_ws(" ", slice(tokens, i, lit(k)))))
    }
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b a b",            // duplicate shingles: distinct order preserved
      "one two",                    // shorter than k=3 -> empty
      "single",                     // one token
      "",                           // empty text (split gives [""])
      "a  b   c d",                 // consecutive spaces -> empty tokens kept
      " leading and trailing ",     // boundary empties
      "héllo wörld ünïcode multi byte ßtring here", // UTF-8 multibyte
      (0 until 200).map(i => s"w${i % 17}").mkString(" ")) // repetitive long doc
    val df = cases.toDF("text")
    for (k <- Seq(1, 2, 3, 5)) {
      val got = df.select(word_shingles(col("text"), k)).as[Seq[String]].collect()
      val want = df.select(hof(col("text"), k)).as[Seq[String]].collect()
      assert(got.toSeq === want.toSeq, s"k=$k")
    }
    // and on real fixture docs, row for row
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").limit(200)
    val both = docs.select(
      word_shingles(col("text"), 3).as("a"),
      hof(col("text"), 3).as("b"))
    assert(both.filter(not(col("a") === col("b"))).count() === 0)
  }

  test("word_grams matches the non-distinct HOF pipeline, multiplicity and stride included") {
    import spark.implicits._
    def hof(text: org.apache.spark.sql.Column, k: Int, stride: Int) = {
      val tokens = split(text, " ")
      val last = size(tokens) - (k - 1)
      val idx = slice(sequence(lit(1), greatest(last, lit(1)), lit(stride)),
        lit(1), greatest(ceil(last.cast("double") / stride).cast("int"), lit(0)))
      transform(idx, i => concat_ws(" ", slice(tokens, i, lit(k))))
    }
    val cases = Seq(
      "a b a b a b a b",  // repeats MUST stay (multiplicity)
      "the quick brown fox jumps over the lazy dog",
      "one two", "single", "", "a  b   c d",
      (0 until 100).map(i => s"t${i % 5}").mkString(" "))
    val df = cases.toDF("text")
    for ((k, stride) <- Seq((2, 1), (3, 1), (2, 2), (16, 8), (4, 3))) {
      val got = df.select(word_grams(col("text"), k, stride)).as[Seq[String]].collect()
      val want = df.select(hof(col("text"), k, stride)).as[Seq[String]].collect()
      assert(got.toSeq === want.toSeq, s"k=$k stride=$stride")
    }
  }

  test("word kernels match the HOF pipelines on random space-laden strings (property)") {
    // random strings over {a, b, space} — maximizes empty tokens,
    // consecutive spaces, boundary spaces, duplicate grams
    val textGen = Gen.listOf(Gen.oneOf('a', 'b', ' ')).map(_.mkString)
    val kGen = Gen.chooseNum(1, 4)
    forAllSampled(Gen.zip(textGen, kGen), n = 120) { case (text, k) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      val toks = text.split(" ", -1).toSeq // Spark split keeps trailing empties
      val expectAll =
        (0 to toks.size - k).map(i => toks.slice(i, i + k).mkString(" "))
      val gotAll = TextOps.wordGrams(u, k, 1)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(gotAll === expectAll, s"grams text='$text' k=$k")
      val gotDistinct = TextOps.wordShingles(u, k)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(gotDistinct === expectAll.distinct, s"shingles text='$text' k=$k")
      val gotStride = TextOps.wordGrams(u, k, 3)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(gotStride === expectAll.zipWithIndex.collect {
        case (g, i) if i % 3 == 0 => g }, s"stride text='$text' k=$k")
    }
  }

  test("word_shingles registers in SQL and stays inside whole-stage codegen") {
    graft.functions.registerAll(spark)
    val out = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS sh").collect()(0).getSeq[String](0)
    assert(out === Seq("a b c", "b c d"))
    // non-foldable input (a literal constant-folds away at plan time);
    // the *(1) span prefix marks whole-stage-codegen'd operators
    val plan = spark.range(3)
      .selectExpr("word_shingles(concat('a b c ', id), 2) AS sh")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(1500))
  }

  test("uuid_v7 ids are UUID-shaped, version 7, and time-ordered across batches") {
    def batch(): Seq[String] =
      Seq("a", "b", "c").toDF("payload")
        .select(uuid_v7().as("id")).as[String].collect().toSeq
    val b1 = batch()
    Thread.sleep(5) // ms-resolution prefix: ensure the clock advances
    val b2 = batch()
    val shape = "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    (b1 ++ b2).foreach(id => assert(shape.matches(id), id))
    assert((b1 ++ b2).distinct.size === 6)
    // every id of the later batch sorts after every id of the earlier
    // one — arrival order survives an ORDER BY id (job.go:86-88)
    assert(b1.max < b2.min)
  }

  test("unit_vec: exact l2 normalization, zero-vector passthrough, codegen'd") {
    import graft.functions.unit_vec
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(-1.0f, 1.0f, 1.0f, 1.0f))).toDF("id", "v")
      .select($"id", unit_vec($"v").as("u"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) === Seq(0.6, 0.8))
    assert(got(2L) === Seq(0.0, 0.0)) // zero norm: unnormalized copy
    assert(math.abs(got(3L).map(x => x * x).sum - 1.0) < 1e-12)
    assert(got(3L)(0) === -0.5)
    // over a real scan (a literal source constant-folds before any
    // codegen question arises) the expression must sit INSIDE a
    // WholeStageCodegen span — it replaced the library's last Scala
    // UDF, so an eval-fallback Project here would be a regression
    val scan = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(unit_vec($"embedding").as("u"))
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.toLowerCase.contains("unit_vec"), plan)
    // and every non-degenerate output really is unit length
    val norms = scan.limit(50).collect()
      .map(_.getSeq[Double](0)).filter(_.exists(_ != 0.0))
      .map(v => v.map(x => x * x).sum)
    assert(norms.nonEmpty && norms.forall(n => math.abs(n - 1.0) < 1e-9))
  }
}
