package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-static hash kernels, called from both interpreted eval and
  * generated code.
  *
  * - FNV-1a 64: byte-for-byte the algorithm the reference partitions
  *   on (`/root/reference/internal/partitioner/hash.go:19-31`, which
  *   feeds `hash % n` fan-out at `internal/partitioner/partition.go:42`).
  * - Polynomial rolling hash: document fingerprinting.
  * - MinHash signatures + SimHash64: near-duplicate detection over
  *   token/shingle arrays (training-data dedup plane).
  */
object HashOps {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over raw bytes. */
  def fnv64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def fnv64(s: UTF8String): Long =
    if (s == null) 0L else fnv64(s.getBytes)

  /** Polynomial rolling hash mod a Mersenne-ish prime: sum s[i]*B^i
    * (mod P). Stable across JVMs; used for document fingerprints. */
  def polyHash(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    val P = 2305843009213693951L // 2^61 - 1
    val B = 131L
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // h*B + b, with 128-bit intermediate via Math.multiplyHigh-free
      // path: h < 2^61, B = 131 → h*B < 2^69; do it in two 61-bit-safe
      // steps: (h << 7) + (h << 1) + h = h*131, each reduced mod P.
      h = modP(modP(h << 7, P) + modP(h << 1, P) + h + (bytes(i) & 0xffL), P)
      i += 1
    }
    h
  }

  @inline private def modP(x: Long, p: Long): Long = {
    val r = x % p
    if (r < 0) r + p else r
  }

  /** One 64-bit mix (splitmix64 finalizer) — cheap independent hash
    * family member i for MinHash: mix(h ^ seed_i). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: k minimums over the token set, hash family
    * h_i(t) = mix64(fnv64(t) ^ mix64(i)). Empty input → all
    * Long.MaxValue (no token evidence). */
  /** mix64(i) for i < k, precomputed once per JVM per k: the seed mix
    * is loop-invariant across tokens, and the JIT does not hoist it
    * out of the token loop — recomputing it per (token, i) pair was
    * measurably half the kernel's multiply work (r21). Values are
    * unchanged; every minhash signature is bit-identical. */
  private val idxMixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def idxMixes(k: Int): Array[Long] =
    idxMixCache.computeIfAbsent(k, kk => Array.tabulate(kk)(i => mix64(i.toLong)))

  def minHash(tokens: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    if (tokens != null) {
      val im = idxMixes(k)
      val n = tokens.numElements()
      var t = 0
      while (t < n) {
        if (!tokens.isNullAt(t)) {
          val base = fnv64(tokens.getUTF8String(t))
          var i = 0
          while (i < k) {
            val h = mix64(base ^ im(i))
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
        t += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** SimHash-64 over a token array: per-bit vote weighted by token
    * frequency (each occurrence votes), sign → bit. */
  def simHash64(tokens: ArrayData): Long = {
    if (tokens == null) return 0L
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = mix64(fnv64(tokens.getUTF8String(t)))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
