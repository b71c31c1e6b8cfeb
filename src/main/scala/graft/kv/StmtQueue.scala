package graft.kv

/** The reference's queued-write path: rqlite's statement queue wired
  * behind `POST /db/execute?queue`
  * (`/root/reference/internal/http/service.go:1106-1159` — enqueue
  * returns a `sequence_number` immediately; `?wait=true` blocks on a
  * flush channel until that batch is applied, 408 on timeout).
  *
  * Spark-first shape: buffering writes and applying them as ONE
  * `KvEngine.execute` batch per flush means one distributed broadcast
  * merge per flush instead of one per HTTP request — the same
  * amortization rqlite's queue buys over Raft proposals, and the same
  * micro-batch semantics as [[graft.streaming.Streaming.queuedWrites]]
  * (there the batchId plays the sequence_number role).
  *
  * Single flusher thread; sequence numbers are monotone from 1.
  * Waiters block on the shared lock and are woken per flush.
  */
final class StmtQueue(kv: KvEngine, flushMs: Long = 50) {

  private[this] val lock = new Object
  private[this] var nextSeq = 0L
  private[this] var appliedSeq = 0L
  private[this] var pending = Vector.empty[(Long, Seq[Statement])]
  @volatile private[this] var running = true

  private val flusher = new Thread(() => {
    while (running) {
      lock.synchronized { if (pending.isEmpty && running) lock.wait(flushMs) }
      flush()
    }
    flush() // drain whatever was enqueued before stop()
  }, "graft-stmt-queue")
  flusher.setDaemon(true)
  flusher.start()

  /** Enqueue a write batch; returns its sequence number immediately
    * (the write is NOT yet applied — that's the queued contract). */
  def write(stmts: Seq[Statement]): Long = lock.synchronized {
    require(running, "statement queue is stopped")
    nextSeq += 1
    pending :+= ((nextSeq, stmts))
    lock.notifyAll()
    nextSeq
  }

  /** Highest applied sequence number. */
  def applied: Long = lock.synchronized(appliedSeq)

  /** Block until `seq` is applied; false on timeout. */
  def waitFor(seq: Long, timeoutMs: Long): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    lock.synchronized {
      while (appliedSeq < seq) {
        val remMs = (deadline - System.nanoTime()) / 1000000L
        if (remMs <= 0) return false
        lock.wait(remMs)
      }
      true
    }
  }

  private def flush(): Unit = {
    val batch = lock.synchronized {
      val b = pending; pending = Vector.empty; b
    }
    if (batch.nonEmpty) {
      // one merge for every request drained this tick. A failing batch
      // is LOGGED AND DROPPED, and the sequence still advances: the
      // reference's queue is explicitly at-most-once (rqlite queue
      // semantics; wire documents its data-loss windows), and the
      // alternative — letting the flusher die — would strand every
      // later ?wait at its timeout.
      try kv.synchronized { kv.execute(batch.flatMap(_._2)) }
      catch {
        case e: Exception =>
          System.err.println(
            s"[stmt-queue] dropped batch of ${batch.size} writes: ${e.getMessage}")
      }
      lock.synchronized {
        appliedSeq = math.max(appliedSeq, batch.map(_._1).max)
        lock.notifyAll()
      }
    }
  }

  /** Stop the flusher after draining outstanding writes. */
  def stop(): Unit = {
    lock.synchronized { running = false; lock.notifyAll() }
    flusher.join(10000)
  }
}
