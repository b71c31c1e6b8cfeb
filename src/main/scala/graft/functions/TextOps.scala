package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels (codegen targets — see expressions.scala). */
object TextOps {

  /** Distinct word k-shingles of a single-space-tokenized text, in
    * first-occurrence order — byte-exact equivalent of
    * `array_distinct(transform(idx, i -> concat_ws(' ', slice(split(text,' '), i, k))))`
    * but ONE pass over the bytes with zero re-joining: k tokens that
    * were split on single spaces re-join (with single spaces) to
    * exactly the substring of the original text from the start of
    * token i to the end of token i+k-1. Consecutive/leading/trailing
    * spaces fall out identically because `split` keeps the empty
    * tokens and `concat_ws` keeps empty strings (it only skips nulls,
    * which `split` never produces).
    *
    * Scanning bytes for 0x20 is UTF-8-safe: no multi-byte sequence
    * contains 0x20 (continuation bytes are >= 0x80). Each shingle is a
    * zero-copy view over the row's byte array.
    */
  /** Token boundary offsets of a single-space-tokenized byte array:
    * (starts, ends, nTok). */
  private def boundaries(b: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val n = b.length
    var spaces = 0
    var i = 0
    while (i < n) { if (b(i) == 0x20) spaces += 1; i += 1 }
    val nTok = spaces + 1
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < n) {
      if (b(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    (starts, ends, nTok)
  }

  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val b = text.getBytes
    val (starts, ends, nTok) = boundaries(b)
    val nSh = nTok - k + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet: dedup with first-occurrence order, matching
    // array_distinct; UTF8String equality is byte equality, same as
    // Spark's string comparison
    val seen = new java.util.LinkedHashSet[UTF8String](nSh * 2)
    var i = 0
    while (i < nSh) {
      seen.add(UTF8String.fromBytes(b, starts(i), ends(i + k - 1) - starts(i)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Non-distinct sibling of [[wordShingles]]: ALL k-grams in token
    * order, with multiplicity, every `stride`-th start (LM counting,
    * Gopher repetition signals, exact-substring windows). Same
    * byte-exact equivalence to
    * `transform(sequence(1, n-k+1, stride), i -> concat_ws(' ', slice(tokens, i, k)))`. */
  def wordGrams(text: UTF8String, k: Int, stride: Int): ArrayData = {
    val b = text.getBytes
    val (starts, ends, nTok) = boundaries(b)
    val nSh = nTok - k + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Any])
    val cnt = (nSh + stride - 1) / stride
    val out = new Array[Any](cnt)
    var i = 0
    var j = 0
    while (i < nSh) {
      out(j) = UTF8String.fromBytes(b, starts(i), ends(i + k - 1) - starts(i))
      j += 1
      i += stride
    }
    new GenericArrayData(out)
  }
}
