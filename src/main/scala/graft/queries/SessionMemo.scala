package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-(SparkSession, sf-dir) memo for expensive shared subtrees (the
  * near-dup pair graph, the IVF index). Two staleness defenses:
  *
  *  - entries belonging to stopped sessions are swept on every access,
  *    so the map cannot pin SparkSession references or checkpointed
  *    blocks past the session's lifetime (long-lived JVMs running many
  *    sessions stay bounded);
  *  - each entry records a FINGERPRINT of the dir's file metadata
  *    (relative path, size, mtime of every file) taken at build time;
  *    an access that sees a different fingerprint rebuilds instead of
  *    serving results mined from data that has since been rewritten.
  *    Dropping the stale entry releases its localCheckpoint blocks via
  *    the ContextCleaner once unreferenced.
  *
  * The walk is driver-side metadata only (no data read); non-local or
  * unreadable paths fingerprint to a constant, degrading to the plain
  * memoize-forever behavior. [[clear]] remains the explicit nuke. */
final class SessionMemo[V](build: (SparkSession, String) => V) {

  private final case class Entry(fp: Long, value: V)
  private val m = new ConcurrentHashMap[(SparkSession, String), Entry]

  private def fingerprint(dir: String): Long = {
    try {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.isDirectory(root)) return 0L
      val walk = java.nio.file.Files.walk(root)
      try {
        var acc = 1125899906842597L // large prime seed
        walk.sorted().forEach { p =>
          if (java.nio.file.Files.isRegularFile(p)) {
            val rel = root.relativize(p).toString
            acc = acc * 31 + rel.hashCode
            acc = acc * 31 + java.nio.file.Files.size(p)
            acc = acc * 31 + java.nio.file.Files.getLastModifiedTime(p).toMillis
          }
        }
        acc
      } finally walk.close()
    } catch { case _: Exception => 0L }
  }

  def apply(s: SparkSession, dir: String): V = {
    m.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val fp = fingerprint(dir)
    m.compute((s, dir), (k, cur) =>
      if (cur != null && cur.fp == fp) cur
      else Entry(fp, build(k._1, k._2))).value
  }

  def clear(): Unit = m.clear()
}
