package graft

import java.nio.file.{Files, Paths}

import graft.queries.SessionMemo

/** SessionMemo staleness: same data → one build; rewritten data under
  * the same dir → fresh build (the r4 advice item — stale checkpointed
  * subtrees must not survive an in-session data rewrite). */
class SessionMemoSpec extends SparkTestBase {

  // the fingerprint TTL cache (ADVICE r5) would otherwise hide a
  // rewrite that lands inside its window — this spec rewrites
  // immediately, so force a re-walk on every access
  sys.props("graft.memo.fp.ttl.ms") = "0"

  test("memo rebuilds after the dir's data is rewritten, not before") {
    val dir = Files.createTempDirectory("graftmemo").toString
    Files.write(Paths.get(dir, "part-0.parquet"), "v1-bytes".getBytes)

    var builds = 0
    val memo = new SessionMemo[Int]((_, _) => { builds += 1; builds })

    assert(memo(spark, dir) === 1)
    assert(memo(spark, dir) === 1) // unchanged data: cached
    assert(builds === 1)

    // rewrite the data under the SAME dir (size change guarantees a
    // fingerprint delta even within mtime granularity)
    Files.write(Paths.get(dir, "part-0.parquet"), "v2-bytes-longer".getBytes)
    assert(memo(spark, dir) === 2) // fresh mining
    assert(memo(spark, dir) === 2)
    assert(builds === 2)

    // adding a file also invalidates
    Files.write(Paths.get(dir, "part-1.parquet"), "more".getBytes)
    assert(memo(spark, dir) === 3)
    assert(builds === 3)
  }

  test("evictFit makes the next access a genuinely cold rebuild") {
    val dir = Files.createTempDirectory("graftmemoevict").toString
    Files.write(Paths.get(dir, "f"), "data".getBytes)
    var builds = 0
    val memo = new SessionMemo[Int]((_, _) => { builds += 1; builds },
      "evictProbe")
    assert(memo(spark, dir) === 1)
    assert(memo(spark, dir) === 1 && builds === 1)
    // the bench fit-retry path: fit_<snake_case(label)> resolves the
    // registered evictor; the next access rebuilds
    assert(SessionMemo.evictFit("fit_evict_probe"))
    assert(memo(spark, dir) === 2 && builds === 2)
    // unknown fit line: no evictor — the caller must not fake a retry
    assert(!SessionMemo.evictFit("fit_no_such_memo"))
  }

  test("distinct dirs memoize independently") {
    val d1 = Files.createTempDirectory("graftmemo1").toString
    val d2 = Files.createTempDirectory("graftmemo2").toString
    Files.write(Paths.get(d1, "f"), "a".getBytes)
    Files.write(Paths.get(d2, "f"), "b".getBytes)
    var builds = 0
    val memo = new SessionMemo[Int]((_, _) => { builds += 1; builds })
    assert(memo(spark, d1) === 1)
    assert(memo(spark, d2) === 2)
    assert(memo(spark, d1) === 1) // d1 entry undisturbed by d2's build
    assert(builds === 2)
  }
}
