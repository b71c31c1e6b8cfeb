package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.AsOf

/** AsOfJoinExec: the custom physical backward as-of join. Verified
  * against the window-over-inequality-join reference on real events
  * data, plus targeted tie / unmatched / boundary cases. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsDf = graft.queries.Catalog.events(spark, sf("sf0.001"))

  test("matches the window reference on events (purchases asof clicks)") {
    val ev = eventsDf.select($"event_id", $"user_id", $"event_type",
      unix_micros($"ts").as("us"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"us".as("p_us"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"us".as("c_us"))

    val got = AsOf.asofJoin(purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("c_user"),
        leftTime = "p_us", rightTime = "c_us", rightTies = Seq("click_id"))
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet

    // reference: inequality join + row_number window (the plan shape
    // the custom operator exists to avoid)
    val w = Window.partitionBy($"purchase_id")
      .orderBy($"c_us".desc, $"click_id".desc)
    val expected = purchases
      .join(clicks, $"user_id" === $"c_user" && $"c_us" <= $"p_us", "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet

    assert(got === expected)
    assert(got.exists(_._2 == -1L) || expected.forall(_._2 != -1L)) // null path exercised consistently
  }

  test("catalog asof_join_phys: exactly one exchange per side, no window") {
    val df = graft.queries.Catalog.queries("asof_join_phys")(spark, sf("sf0.001"))
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // SMJ's shuffle budget: one hash exchange per side (plus the
    // presentation sort's range exchange) — nothing quadratic. AQE's
    // toString repeats the tree under "== Initial Plan ==": count the
    // final section only.
    val finalPlan = plan.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(hashEx === 2, s"expected 2 hash exchanges, got $hashEx:\n$finalPlan")
  }

  test("physical plan is the custom operator, not a window or nested loop") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "x")).toDF("k2", "t2", "rv")
    val df = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tie semantics: equal times resolve to the highest tiebreak") {
    val l = Seq((1L, 100L, "p1")).toDF("k", "t", "lv")
    val r = Seq((1L, 100L, 1L), (1L, 100L, 2L), (1L, 99L, 3L))
      .toDF("k2", "t2", "rid")
    val got = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .select("rid").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L)) // t2=100 qualifies (<=), rid 2 beats rid 1
  }

  test("unmatched left rows keep a null right side; stale candidates don't leak") {
    val l = Seq((1L, 100L, "has"), (2L, 100L, "none"), (3L, 1L, "early"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 50L, 7L), (3L, 10L, 8L)).toDF("k2", "t2", "rid")
    val got = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .select($"k", $"rid").collect()
      .map(rw => rw.getLong(0) -> (if (rw.isNullAt(1)) -1L else rw.getLong(1))).toMap
    assert(got === Map(1L -> 7L, 2L -> -1L, 3L -> -1L))
    // k=2: no right rows at all; k=3: right row exists but t2 > t
  }

  test("tolerance nulls out matches older than the window") {
    val l = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "t", "lv")
    val r = Seq((1L, 95L, 7L)).toDF("k2", "t2", "rid")
    val got = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"),
        tolerance = Some(10L))
      .select($"t", $"rid").collect()
      .map(rw => rw.getLong(0) -> (if (rw.isNullAt(1)) -1L else rw.getLong(1))).toMap
    // t=100: click at 95 is within 10; t=200: 105 behind -> null
    assert(got === Map(100L -> 7L, 200L -> -1L))
  }

  test("tolerance distance saturates on adversarial Long overflow instead of wrapping") {
    // a qualifying candidate at the far end of the Long domain: the
    // true distance (~2^64) exceeds any tolerance, but lT - rT wraps
    // NEGATIVE — an unsaturated check would read the wrap as
    // within-tolerance and keep a match 18 quintillion ticks away
    val l = Seq((1L, Long.MaxValue, "a")).toDF("k", "t", "lv")
    val r = Seq((1L, Long.MinValue + 10L, 7L)).toDF("k2", "t2", "rid")
    val got = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"),
        tolerance = Some(1000L))
      .select($"rid").collect()
    assert(got.length === 1 && got.head.isNullAt(0),
      s"wrapped distance passed tolerance: ${got.mkString}")
    // sanity: without tolerance the same candidate matches (backward
    // as-of has no distance bound)
    val free = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .select($"rid").collect()
    assert(free.length === 1 && free.head.getLong(0) === 7L)
  }

  test("forward as-of: earliest right at or after, ties to highest tiebreak") {
    val l = Seq((1L, 100L, "a"), (1L, 300L, "b")).toDF("k", "t", "lv")
    val r = Seq((1L, 150L, 1L), (1L, 150L, 2L), (1L, 50L, 9L)).toDF("k2", "t2", "rid")
    val got = AsOf.asofJoinForward(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .select($"t", $"rid").collect()
      .map(rw => rw.getLong(0) -> (if (rw.isNullAt(1)) -1L else rw.getLong(1))).toMap
    // t=100 -> earliest at/after is 150 (tie -> rid 2); t=300 -> none
    assert(got === Map(100L -> 2L, 300L -> -1L))
    // schema round-trips exactly (negation columns dropped)
    val cols = AsOf.asofJoinForward(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .columns.toSeq
    assert(cols === Seq("k", "t", "lv", "k2", "t2", "rid"))
  }

  test("null keys and times never match, matching SQL join semantics") {
    // right rows with null key or null time are skipped; left rows with
    // null key or null time join the null right side — exactly what the
    // window/SQL oracle does (`c.k = p.k AND c.t <= p.t` rejects nulls)
    val l = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 100L, "match"), (null, 100L, "nullkey"), (2L, null, "nulltime"),
      (3L, 100L, "onlynullright")).toDF("k", "t", "lv")
    val r = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 50L, 7L),          // the one legitimate candidate
      (1L, null, 99L),        // null time: never a candidate
      (null, 40L, 98L),       // null key: never a candidate
      (3L, null, 97L)         // k=3's only right row has a null time
    ).toDF("k2", "t2", "rid")
    val got = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .select($"lv", $"rid").collect()
      .map(rw => rw.getString(0) -> (if (rw.isNullAt(1)) -1L else rw.getLong(1))).toMap
    assert(got === Map("match" -> 7L, "nullkey" -> -1L,
      "nulltime" -> -1L, "onlynullright" -> -1L))
    // tolerance path stays safe with nulls in play (no null-time
    // candidate ever reaches the getLong tolerance check)
    val tol = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"),
        tolerance = Some(60L))
      .select($"lv", $"rid").collect()
      .map(rw => rw.getString(0) -> (if (rw.isNullAt(1)) -1L else rw.getLong(1))).toMap
    assert(tol === Map("match" -> 7L, "nullkey" -> -1L,
      "nulltime" -> -1L, "onlynullright" -> -1L))
  }

  test("self-join: duplicate exprIds are re-instanced, result is correct") {
    // previous-event-per-key: a table as-of-joined to ITSELF with a
    // strictly-earlier guard is the classic self-join shape; without
    // attribute dedup the right side's exprIds collide with the left's
    val df = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L),
      (2L, 15L, 400L)).toDF("k", "t", "rid")
    val out = AsOf.asofJoin(df, df, Seq("k"), Seq("k"), "t", "t", Seq("rid"))
    // schema carries both sides' columns, all exprIds distinct
    val exprIds = out.queryExecution.analyzed.output.map(_.exprId)
    assert(exprIds.distinct.size === exprIds.size, s"duplicate exprIds: $exprIds")
    // t2 <= t includes the row itself, and ties resolve to the highest
    // tiebreak — the self match (same t, highest rid among <= t) wins
    val got = out.collect()
    assert(got.length === 4)
    got.foreach { rw => assert(rw.getLong(2) === rw.getLong(5)) } // rid == matched rid
  }

  test("nearest as-of: closer side wins, backward wins ties, tolerance bounds both") {
    val l = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 310L, "c"),
      (2L, 50L, "d"), (3L, 10L, "e")).toDF("k", "t", "lv")
    val r = Seq(
      (1L, 90L, 1L),   // 10 behind t=100
      (1L, 105L, 2L),  // 5 ahead of t=100  -> nearest for a
      (1L, 195L, 3L),  // 5 behind t=200; forward 205 is also 5 -> backward wins
      (1L, 205L, 4L),  //
      (1L, 400L, 5L),  // 90 ahead of t=310 vs 105 behind -> forward wins for c
      (3L, 1000L, 9L)  // only match for e is 990 ahead
    ).toDF("k2", "t2", "rid")
    def run(tol: Option[Long]) =
      AsOf.asofJoinNearest(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"), tol)
        .select($"lv", $"rid").collect()
        .map(rw => rw.getString(0) -> (if (rw.isNullAt(1)) -1L else rw.getLong(1))).toMap
    assert(run(None) === Map("a" -> 2L, "b" -> 3L, "c" -> 5L, "d" -> -1L, "e" -> 9L))
    // tolerance 50 drops every match further than 50 in EITHER
    // direction (c: 105 behind / 90 ahead; e: 990 ahead)
    assert(run(Some(50L)) === Map("a" -> 2L, "b" -> 3L, "c" -> -1L,
      "d" -> -1L, "e" -> -1L))
  }

  test("nearest tie rules: backward keeps highest tiebreak, forward the lowest") {
    val l = Seq((1L, 100L, "back"), (2L, 100L, "fwd")).toDF("k", "t", "lv")
    val r = Seq(
      (1L, 100L, 1L), (1L, 100L, 2L),  // dist 0 = backward; highest rid wins
      (2L, 150L, 5L), (2L, 150L, 6L)   // equal future times; cursor = lowest rid
    ).toDF("k2", "t2", "rid")
    val got = AsOf.asofJoinNearest(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .select($"lv", $"rid").collect()
      .map(rw => rw.getString(0) -> rw.getLong(1)).toMap
    assert(got === Map("back" -> 2L, "fwd" -> 5L))
  }

  test("nearest matches the two-pass backward/forward composition on events") {
    val ev = eventsDf.select($"event_id", $"user_id", $"event_type",
      unix_micros($"ts").as("us"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"us".as("p_us"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"us".as("c_us"))
    def toMapOf(df: org.apache.spark.sql.DataFrame) = df
      .select($"purchase_id", $"click_id", $"c_us")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    val near = toMapOf(AsOf.asofJoinNearest(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "p_us", "c_us", Seq("click_id")))
    val back = toMapOf(AsOf.asofJoin(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "p_us", "c_us", Seq("click_id")))
    val pTime = purchases.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // composition reference: nearest distance == min of the two passes'
    // distances (forward tie details differ from asofJoinForward's
    // highest-tiebreak rule, so compare distances, not ids)
    val fwd = toMapOf(AsOf.asofJoinForward(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "p_us", "c_us", Seq("click_id")))
    near.foreach { case (pid, n) =>
      val dist = (m: Option[(Long, Long)]) =>
        m.map(c => math.abs(c._2 - pTime(pid))).getOrElse(Long.MaxValue)
      assert(dist(n) === math.min(dist(back(pid)), dist(fwd(pid))), s"purchase $pid")
    }
    assert(near.values.exists(_.isDefined))
  }

  test("sharded as-of equals the plain operator on events, for several window sizes") {
    val ev = eventsDf.select($"event_id", $"user_id", $"event_type",
      unix_micros($"ts").as("us"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"us".as("p_us"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"us".as("c_us"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"purchase_id", $"click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val plain = rows(AsOf.asofJoin(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "p_us", "c_us", Seq("click_id")))
    // hour-ish, day-ish, and huge (single-window degenerate) shards
    for (w <- Seq(3600000000L, 86400000000L, Long.MaxValue / 4)) {
      val sharded = rows(AsOf.asofJoinSharded(purchases, clicks,
        Seq("user_id"), Seq("c_user"), "p_us", "c_us", Seq("click_id"),
        windowSize = w))
      assert(sharded === plain, s"windowSize=$w")
    }
    // tolerance flows through to the real-time check
    val tolPlain = rows(AsOf.asofJoin(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "p_us", "c_us", Seq("click_id"),
      tolerance = Some(600000000L)))
    val tolSharded = rows(AsOf.asofJoinSharded(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "p_us", "c_us", Seq("click_id"),
      windowSize = 3600000000L, tolerance = Some(600000000L)))
    assert(tolSharded === tolPlain)
  }

  test("sharded as-of: carries cross empty windows; shuffle keys include the window") {
    // one hot key, right rows only in early windows — left rows many
    // windows later must still find the carry
    val l = Seq((1L, 5L, "w0"), (1L, 95L, "w9"), (1L, 73L, "w7"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 3L, 30L), (1L, 8L, 80L)).toDF("k2", "t2", "rid")
    val df = AsOf.asofJoinSharded(l, r, Seq("k"), Seq("k2"), "t", "t2",
      Seq("rid"), windowSize = 10L)
    val got = df.select($"lv", $"rid").collect()
      .map(rw => rw.getString(0) -> rw.getLong(1)).toMap
    // w0: sees its own window's rows up to t=5 -> rid 30; later windows
    // (7 and 9, windows 1..6,8 empty of rights) carry rid 80 forward
    assert(got === Map("w0" -> 30L, "w7" -> 80L, "w9" -> 80L))
    // the final as-of shuffles on (key, window) — the skew lever
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_lwb"), plan.take(2000))
    // schema round-trips: no internal columns leak
    assert(df.columns.toSeq === Seq("k", "t", "lv", "k2", "t2", "rid"))
  }

  test("randomized: sharded as-of equals plain over random hot-key data and windows") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      // one deliberately hot key (half of all rows) among a few others
      def key() = if (rnd.nextBoolean()) 1L else 2L + rnd.nextInt(3)
      val l = Seq.fill(120)((key(), rnd.nextInt(1000).toLong, rnd.nextLong()))
        .toDF("k", "t", "lid")
      val r = Seq.fill(120)((key(), rnd.nextInt(1000).toLong, rnd.nextLong()))
        .toDF("k2", "t2", "rid")
      val w = 1L + rnd.nextInt(300)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"lid", $"rid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val plain = rows(AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid")))
      val sharded = rows(AsOf.asofJoinSharded(l, r, Seq("k"), Seq("k2"),
        "t", "t2", Seq("rid"), windowSize = w))
      assert(sharded === plain, s"trial $trial windowSize=$w")
    }
  }

  test("randomized: sharded FORWARD as-of equals plain forward over hot-key data") {
    val rnd = new scala.util.Random(4321)
    for (trial <- 1 to 3) {
      def key() = if (rnd.nextBoolean()) 1L else 2L + rnd.nextInt(3)
      val l = Seq.fill(120)((key(), rnd.nextInt(1000).toLong, rnd.nextLong()))
        .toDF("k", "t", "lid")
      val r = Seq.fill(120)((key(), rnd.nextInt(1000).toLong, rnd.nextLong()))
        .toDF("k2", "t2", "rid")
      val w = 1L + rnd.nextInt(300)
      val tol = if (rnd.nextBoolean()) Some(1L + rnd.nextInt(200).toLong) else None
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"lid", $"rid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val plain = rows(AsOf.asofJoinForward(l, r, Seq("k"), Seq("k2"),
        "t", "t2", Seq("rid"), tol))
      val sharded = rows(AsOf.asofJoinShardedForward(l, r, Seq("k"), Seq("k2"),
        "t", "t2", Seq("rid"), windowSize = w, tolerance = tol))
      assert(sharded === plain, s"trial $trial windowSize=$w tol=$tol")
    }
  }

  test("randomized: sharded NEAREST as-of equals plain nearest over hot-key data") {
    val rnd = new scala.util.Random(9876)
    for (trial <- 1 to 3) {
      def key() = if (rnd.nextBoolean()) 1L else 2L + rnd.nextInt(3)
      // a narrow time domain on purpose: plenty of duplicate times, so
      // both directions' TIE rules (backward highest rid, forward
      // lowest rid, backward beats forward) are exercised for real
      val l = Seq.fill(120)((key(), rnd.nextInt(200).toLong, rnd.nextLong()))
        .toDF("k", "t", "lid")
      val r = Seq.fill(120)((key(), rnd.nextInt(200).toLong, rnd.nextLong()))
        .toDF("k2", "t2", "rid")
      val w = 1L + rnd.nextInt(80)
      val tol = if (rnd.nextBoolean()) Some(1L + rnd.nextInt(60).toLong) else None
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"lid", $"rid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val plain = rows(AsOf.asofJoinNearest(l, r, Seq("k"), Seq("k2"),
        "t", "t2", Seq("rid"), tol))
      val sharded = rows(AsOf.asofJoinShardedNearest(l, r, Seq("k"), Seq("k2"),
        "t", "t2", Seq("rid"), windowSize = w, tolerance = tol))
      assert(sharded === plain, s"trial $trial windowSize=$w tol=$tol")
    }
  }

  test("sharded forward/nearest: carries cross empty windows in both directions") {
    // hot key, rights clustered in early AND late windows; left rows in
    // the empty middle must find the right carry on each side
    val l = Seq((1L, 47L, "mid"), (1L, 5L, "early"), (1L, 93L, "late"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 8L, 80L), (1L, 91L, 910L)).toDF("k2", "t2", "rid")
    val fwd = AsOf.asofJoinShardedForward(l, r, Seq("k"), Seq("k2"), "t", "t2",
      Seq("rid"), windowSize = 10L)
      .select($"lv", $"rid").collect()
      .map(rw => rw.getString(0) -> (if (rw.isNullAt(1)) -1L else rw.getLong(1))).toMap
    // forward: earliest right at-or-after; t=93 has none -> null
    assert(fwd === Map("early" -> 80L, "mid" -> 910L, "late" -> -1L))
    val near = AsOf.asofJoinShardedNearest(l, r, Seq("k"), Seq("k2"), "t", "t2",
      Seq("rid"), windowSize = 10L)
      .select($"lv", $"rid").collect()
      .map(rw => rw.getString(0) -> rw.getLong(1)).toMap
    // nearest: 47 is 39 from rid 80 and 44 from rid 910 -> backward 80
    assert(near === Map("early" -> 80L, "mid" -> 80L, "late" -> 910L))
    // schema round-trips: no internal columns leak
    val df = AsOf.asofJoinShardedNearest(l, r, Seq("k"), Seq("k2"), "t", "t2",
      Seq("rid"), windowSize = 10L)
    assert(df.columns.toSeq === Seq("k", "t", "lv", "k2", "t2", "rid"))
    // both directions' final as-ofs shuffle on (key, window) — the
    // skew lever is in the executed plan, not just the result
    val nearPlan = df.queryExecution.executedPlan.toString
    assert(nearPlan.contains("__graft_lwb"), nearPlan.take(2000))
    val fwdPlan = AsOf.asofJoinShardedForward(l, r, Seq("k"), Seq("k2"),
        "t", "t2", Seq("rid"), windowSize = 10L)
      .queryExecution.executedPlan.toString
    assert(fwdPlan.contains("__graft_lwb"), fwdPlan.take(2000))
  }

  test("backward as-of works directly on timestamp time columns") {
    // the no-tolerance merge is type-agnostic (natural ordering over
    // the internal µs long) — no unix_micros pre-conversion required
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b")).toDF("k", "t", "lv")
    val r = Seq((1L, ts("2024-01-01 09:30:00"), 7L),
      (1L, ts("2024-01-01 11:00:00"), 8L),
      (1L, ts("2024-01-01 13:00:00"), 9L)).toDF("k2", "t2", "rid")
    val got = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .select($"lv", $"rid").collect()
      .map(rw => rw.getString(0) -> rw.getLong(1)).toMap
    assert(got === Map("a" -> 7L, "b" -> 8L))
  }

  test("several left rows per key reuse and upgrade the candidate") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, 100L), (1L, 15L, 200L), (1L, 25L, 300L)).toDF("k2", "t2", "rid")
    val got = AsOf.asofJoin(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
      .select($"t", $"rid").collect().map(rw => rw.getLong(0) -> rw.getLong(1)).toMap
    assert(got === Map(10L -> 100L, 20L -> 200L, 30L -> 300L))
  }

  // ---- the forward-negation domain edge (AsOfJoin.scala's documented
  // -Long.MinValue behavior, pinned in BOTH ANSI modes)

  private def hasArithmeticCause(t: Throwable): Boolean = {
    var c: Throwable = t
    while (c != null) {
      if (c.isInstanceOf[ArithmeticException] ||
        Option(c.getMessage).exists(m =>
          m.contains("ARITHMETIC_OVERFLOW") || m.toLowerCase.contains("overflow")))
        return true
      c = c.getCause
    }
    false
  }

  test("forward negation edge: a Long.MinValue time fails loudly under ANSI") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true") // the default
    val l = Seq((1L, Long.MinValue), (1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 100L)).toDF("k2", "t2", "rid")
    val plain = intercept[Throwable] {
      AsOf.asofJoinForward(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
        .collect()
    }
    assert(hasArithmeticCause(plain), s"unexpected failure shape: $plain")
    val sharded = intercept[Throwable] {
      AsOf.asofJoinShardedForward(l, r, Seq("k"), Seq("k2"), "t", "t2",
          Seq("rid"), windowSize = 7L)
        .collect()
    }
    assert(hasArithmeticCause(sharded), s"unexpected failure shape: $sharded")
  }

  test("forward negation edge: with ANSI off, Long.MinValue wraps to itself " +
      "and matches only an exactly-equal right time") {
    // -Long.MinValue wraps to Long.MinValue, so in the negated domain
    // the edge value stays the SMALLEST long: a Long.MinValue left time
    // behaves like the latest possible time — no strictly-later right
    // row ever qualifies, only an exactly-equal one. Defined, pinned
    // behavior rather than a silent wrong answer.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val l = Seq((1L, Long.MinValue), (1L, 10L), (2L, Long.MinValue))
        .toDF("k", "t")
      val r = Seq((1L, 5L, 100L), (1L, 20L, 200L), (2L, Long.MinValue, 300L))
        .toDF("k2", "t2", "rid")
      val got = AsOf.asofJoinForward(l, r, Seq("k"), Seq("k2"), "t", "t2", Seq("rid"))
        .select($"k", $"t", $"rid")
        .collect()
        .map(rw => (rw.getLong(0), rw.getLong(1)) ->
          (if (rw.isNullAt(2)) -1L else rw.getLong(2))).toMap
      assert(got === Map(
        (1L, Long.MinValue) -> -1L,  // real rights at 5/20 never qualify
        (1L, 10L)           -> 200L, // ordinary forward match unaffected
        (2L, Long.MinValue) -> 300L  // exact-equal edge time still matches
      ))
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("reserved negation names are refused across the as-of family") {
    val l = Seq((1L, 10L)).toDF("k", "t").withColumn("__graft_neg_lt", lit(1L))
    val r = Seq((1L, 5L, 100L)).toDF("k2", "t2", "rid")
    for (op <- Seq[(DataFrame, DataFrame) => DataFrame](
      (a, b) => AsOf.asofJoinForward(a, b, Seq("k"), Seq("k2"), "t", "t2"),
      (a, b) => AsOf.asofJoinSharded(a, b, Seq("k"), Seq("k2"), "t", "t2",
        windowSize = 7L),
      (a, b) => AsOf.asofJoinShardedForward(a, b, Seq("k"), Seq("k2"), "t", "t2",
        windowSize = 7L),
      (a, b) => AsOf.asofJoinShardedNearest(a, b, Seq("k"), Seq("k2"), "t", "t2",
        windowSize = 7L))) {
      val e = intercept[IllegalArgumentException](op(l, r))
      assert(e.getMessage.contains("__graft_neg_lt"))
    }
  }
}
