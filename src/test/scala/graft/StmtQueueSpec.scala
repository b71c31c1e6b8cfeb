package graft

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.kv.{SetStmt, Statement, StmtQueue}

/** Failure semantics of the queued-write path (ADVICE round 5): a
  * flush that fails every retry must NOT report success to `?wait` —
  * the dropped sequence range is remembered and surfaced as
  * [[StmtQueue.Dropped]], while the flusher survives to apply later
  * batches. */
class StmtQueueSpec extends AnyFunSuite {

  private def stmt(k: String): Seq[Statement] = Seq(SetStmt(k, "v"))

  test("a batch failing every retry reports Dropped, not success") {
    val q = new StmtQueue(_ => throw new RuntimeException("boom"),
      flushMs = 10, maxRetries = 2)
    try {
      val s = q.write(stmt("a"))
      assert(q.waitFor(s, 5000) === StmtQueue.Dropped)
    } finally q.stop()
  }

  test("a transient failure is retried and reports Applied") {
    val applied = collection.mutable.ArrayBuffer.empty[Seq[Statement]]
    val fails = new AtomicInteger(1) // fail the first attempt only
    val q = new StmtQueue(stmts => {
      if (fails.getAndDecrement() > 0) throw new RuntimeException("transient")
      applied.synchronized { applied += stmts }
    }, flushMs = 10, maxRetries = 2)
    try {
      val s = q.write(stmt("a"))
      assert(q.waitFor(s, 5000) === StmtQueue.Applied)
      assert(applied.synchronized(applied.flatten.nonEmpty))
    } finally q.stop()
  }

  test("the flusher survives a dropped batch; later writes apply") {
    val applied = collection.mutable.ArrayBuffer.empty[Seq[Statement]]
    // every attempt on the first flush fails; all later flushes succeed
    val failing = new AtomicInteger(3) // 1 + maxRetries attempts
    val q = new StmtQueue(stmts => {
      if (failing.getAndDecrement() > 0) throw new RuntimeException("boom")
      applied.synchronized { applied += stmts }
    }, flushMs = 10, maxRetries = 2)
    try {
      val s1 = q.write(stmt("lost"))
      assert(q.waitFor(s1, 5000) === StmtQueue.Dropped)
      val s2 = q.write(stmt("kept"))
      assert(s2 > s1) // monotone across the failure
      assert(q.waitFor(s2, 5000) === StmtQueue.Applied)
      assert(applied.synchronized(applied.flatten.exists {
        case SetStmt(k, _) => k == "kept"
        case _             => false
      }))
    } finally q.stop()
  }

  test("waitFor on an unflushed sequence times out") {
    // an apply that blocks forever: the first flush never completes
    val q = new StmtQueue(_ => Thread.sleep(60000), flushMs = 10, maxRetries = 0)
    try {
      val s = q.write(stmt("slow"))
      assert(q.waitFor(s, 200) === StmtQueue.TimedOut)
    } finally () // don't stop(): it would join the blocked flusher
  }
}
