package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-(SparkSession, sf-dir) memo for expensive shared subtrees (the
  * near-dup pair graph, the IVF index). Entries belonging to stopped
  * sessions are swept on every access, so the map cannot pin
  * SparkSession references or checkpointed blocks past the session's
  * lifetime (long-lived JVMs running many sessions stay bounded).
  * [[clear]] is the explicit hook for callers that rewrite the data
  * under a dir within one session. */
final class SessionMemo[V](build: (SparkSession, String) => V) {
  private val m = new ConcurrentHashMap[(SparkSession, String), V]

  def apply(s: SparkSession, dir: String): V = {
    m.keySet.removeIf(k => k._1.sparkContext.isStopped)
    m.computeIfAbsent((s, dir), k => build(k._1, k._2))
  }

  def clear(): Unit = m.clear()
}
