package graft

import graft.queries.MemoTrack

/** The memo-readership ledger Bench derives `amortized`/`fit_deps`
  * from, plus the fit-line naming coherence the derivation rests on:
  * a fit thunk named differently from the memo label it builds would
  * produce fit_deps pointing at bench lines that don't exist. */
class MemoTrackSpec extends SparkTestBase {

  test("within/record/readsOf: attribution is per-scope, nesting restores, unscoped reads ignored") {
    MemoTrack.clear()
    MemoTrack.record("orphan") // no scope: dropped
    MemoTrack.within("q1") {
      MemoTrack.record("a")
      MemoTrack.within("q2") { MemoTrack.record("b") }
      MemoTrack.record("c") // nesting restored to q1
    }
    MemoTrack.record("orphan2")
    assert(MemoTrack.readsOf("q1") === Seq("a", "c"))
    assert(MemoTrack.readsOf("q2") === Seq("b"))
    assert(MemoTrack.readsOf("nope") === Seq.empty)
    MemoTrack.clear()
    assert(MemoTrack.readsOf("q1") === Seq.empty)
  }

  test("fitName: snake_case derivation (floor parsers only match [a-z0-9_]+ rows)") {
    assert(MemoTrack.fitName("pairCounts") === "fit_pair_counts")
    assert(MemoTrack.fitName("semanticDedupHier") === "fit_semantic_dedup_hier")
    assert(MemoTrack.fitName("sq8Index") === "fit_sq8_index")
    assert(MemoTrack.fitName("bpeModel") === "fit_bpe_model")
  }

  test("no __GRAFT_ placeholder survives substituteOraclePaths in any oracle SQL") {
    // a token used in SQL but missing from the substitution chain
    // would reach DuckDB verbatim and fail the driver gate as an
    // unreadable path — catch the registration gap here instead
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val sub = graft.queries.Batch13.substituteOraclePaths(sql, "/tmp/x")
      assert(!sub.contains("__GRAFT_"),
        s"$name: unsubstituted placeholder in oracle SQL: " +
          sub.split("\n").find(_.contains("__GRAFT_")).getOrElse(""))
    }
    // and the substitution is actually dir-sensitive (two dirs must
    // never share an artifact path — the r13 advice bug)
    val tok = graft.queries.Batch13.BpeOraclePathToken
    assert(graft.queries.Batch13.substituteOraclePaths(tok, "/a")
      !== graft.queries.Batch13.substituteOraclePaths(tok, "/b"))
  }

  test("every fit thunk's name equals fitName(label) of the memo it actually builds") {
    // run each thunk under its own MemoTrack scope on the smallest
    // fixture and check the recorded label round-trips to the thunk's
    // own name — the mechanical convention Bench's fit_deps derivation
    // rests on. A thunk may TRANSITIVELY read other memos (sq8 builds
    // on ivf); the requirement is that its own memo is among them.
    val dir = sf("sf0.001")
    val thunks =
      graft.queries.Batch3.fitThunks(spark, dir) ++
      graft.queries.Batch4.fitThunks(spark, dir) ++
      graft.queries.Batch9.fitThunks(spark, dir) ++
      graft.queries.Batch10.fitThunks(spark, dir) ++
      graft.queries.Batch12.fitThunks(spark, dir)
    assert(thunks.map(_._1).distinct.size === thunks.size, "duplicate fit names")
    thunks.foreach { case (fname, thunk) =>
      assert(fname.matches("fit_[a-z0-9_]+"),
        s"$fname must be fit_<snake_case> — camelCase falls out of every floor parser")
      MemoTrack.clear()
      MemoTrack.within(s"spec-$fname")(thunk())
      val fits = MemoTrack.readsOf(s"spec-$fname").map(MemoTrack.fitName)
      assert(fits.contains(fname),
        s"thunk $fname recorded labels ${fits.mkString(",")} — its own memo label must round-trip to its name")
    }
    MemoTrack.clear()
  }
}
