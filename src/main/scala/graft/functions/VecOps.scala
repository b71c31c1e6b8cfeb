package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** JVM-static vector kernels over `array<float>` embedding columns
  * (the `embeddings.embedding` fixture column). Double accumulation
  * for stable, order-deterministic results. */
object VecOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** Cosine similarity, clamped to [-1, 1] (float rounding can push
    * self-similarity to 1+2e-16); 0.0 when either vector has zero
    * norm. Formula is dot/(sqrt(na)*sqrt(nb)) in double — verified
    * bitwise-identical to DuckDB's list_cosine_similarity over
    * DOUBLE[] on the fixture embeddings. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0
    else math.max(-1.0, math.min(1.0, dot(a, b) / (na * nb)))
  }

  /** l2-normalized copy of an `array<float>` as `array<double>` (the
    * unit vector the k-means fit consumes); a zero-norm input returns
    * its unnormalized (all-zero) copy. Matches the retired fit-side
    * UDF bit-for-bit: same double widening, same sqrt, same division. */
  def unitVec(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; out(i) = v; s += v * v; i += 1 }
    val nm = math.sqrt(s)
    if (nm != 0.0) { i = 0; while (i < n) { out(i) /= nm; i += 1 } }
    ArrayData.toArrayData(out)
  }

  /** Random-hyperplane LSH bits: bit j = sign of <r_j, v> where the
    * hyperplane components are deterministic ±1 (Achlioptas-style
    * sparse random projection, seeded by (j, i) through splitmix64 —
    * no stored plane matrix, so executors need no broadcast). */
  def rpBits(v: ArrayData, nBits: Int, seed: Long): Long = {
    var bits = 0L
    val n = v.numElements()
    var j = 0
    while (j < nBits) {
      var s = 0.0
      var i = 0
      val rowSeed = HashOps.mix64(seed ^ (j.toLong * 0x9e3779b97f4a7c15L))
      while (i < n) {
        val r = HashOps.mix64(rowSeed ^ i.toLong)
        val sign = if ((r & 1L) == 1L) 1.0 else -1.0
        s += sign * v.getFloat(i).toDouble
        i += 1
      }
      if (s >= 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** Driver-side cosine between two float[] (centroid ranking in the
    * IVF search paths — same arithmetic as [[cosine]]). */
  def cosineFF(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i).toDouble * b(i); i += 1 }
    i = 0
    while (i < a.length) { na += a(i).toDouble * a(i); i += 1 }
    i = 0
    while (i < b.length) { nb += b(i).toDouble * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0
    else math.max(-1.0, math.min(1.0, d / (math.sqrt(na) * math.sqrt(nb))))
  }

  /** Cosine of a vector against centroid `cluster` of a center table
    * riding as a plan reference object — the scoring twin of
    * [[argmaxCosine]]. Bit-identical to
    * `cosine(v, element_at(centersLiteral, cluster+1))`, which it
    * replaces: the literal form inlines all k·d center floats into the
    * plan tree (unprintable and unshippable at SemDeDup-scale k).
    * An out-of-range cluster id throws, like ANSI `element_at`. */
  def centroidCosine(v: ArrayData, cluster: Int, centers: Array[Array[Float]]): Double = {
    if (cluster < 0 || cluster >= centers.length)
      throw new ArrayIndexOutOfBoundsException(
        s"centroid_cosine: cluster $cluster out of [0, ${centers.length})")
    val cent = centers(cluster)
    // the exact [[cosine]] arithmetic, with the centroid side read
    // from the float[] instead of an ArrayData
    val na = norm(v)
    var nb = 0.0
    var i = 0
    while (i < cent.length) { val x = cent(i).toDouble; nb += x * x; i += 1 }
    val nbs = math.sqrt(nb)
    if (na == 0.0 || nbs == 0.0) 0.0
    else {
      var d = 0.0
      i = 0
      val n = math.min(v.numElements(), cent.length)
      while (i < n) { d += v.getFloat(i).toDouble * cent(i).toDouble; i += 1 }
      math.max(-1.0, math.min(1.0, d / (na * nbs)))
    }
  }

  /** Index of the max-cosine centroid, first-wins on ties (the same
    * rule as `array_position(sims, array_max(sims))`, which this
    * kernel replaces: per-center cosines use the exact [[cosine]]
    * arithmetic, so results are bit-identical to the literal-inlined
    * expression tree it supersedes). */
  def argmaxCosine(v: ArrayData, centers: Array[Array[Float]]): Int = {
    val nv = norm(v)
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centers.length) {
      val cent = centers(c)
      var dot = 0.0
      var nc = 0.0
      var i = 0
      val m = math.min(v.numElements(), cent.length)
      while (i < m) { dot += v.getFloat(i).toDouble * cent(i); i += 1 }
      i = 0
      while (i < cent.length) { nc += cent(i).toDouble * cent(i); i += 1 }
      val s =
        if (nv == 0.0 || nc == 0.0) 0.0
        else math.max(-1.0, math.min(1.0, dot / (nv * math.sqrt(nc))))
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  /** Second-level assignment for a two-level (hierarchical) quantizer:
    * the GLOBAL cluster id `cell * k2 + j` where j is the max-cosine
    * sub-centroid of `subCenters(cell)` (first wins ties, the
    * [[argmaxCosine]] rule). All cells must have the same width k2 —
    * the builder pads short/empty cells — so the flat id is
    * `centers(cluster)`-addressable. Cost is O(k2·d) per row: with the
    * coarse pass's O(k1·d) that is O(2·sqrt(k)·d) per row total,
    * against O(k·d) for a flat argmax. */
  def argmaxCosineCell(v: ArrayData, cell: Int,
      subCenters: Array[Array[Array[Float]]]): Int = {
    if (cell < 0 || cell >= subCenters.length)
      throw new ArrayIndexOutOfBoundsException(
        s"argmax_cosine_cell: cell $cell out of [0, ${subCenters.length})")
    val sub = subCenters(cell)
    val nv = norm(v)
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < sub.length) {
      val cent = sub(c)
      var dot = 0.0
      var nc = 0.0
      var i = 0
      val m = math.min(v.numElements(), cent.length)
      while (i < m) { dot += v.getFloat(i).toDouble * cent(i); i += 1 }
      i = 0
      while (i < cent.length) { nc += cent(i).toDouble * cent(i); i += 1 }
      val s =
        if (nv == 0.0 || nc == 0.0) 0.0
        else math.max(-1.0, math.min(1.0, dot / (nv * math.sqrt(nc))))
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    cell * subCenters(0).length + best
  }

  // ---- product quantization (PQ) kernels ----------------------------

  /** Encode a float vector as m sub-codes: for each of the m
    * contiguous d/m-dim subvectors, the index (0..|codebook|-1) of the
    * nearest (L2) subspace centroid. `centers(sub)(c)` is centroid c of
    * subspace sub. Returns byte[] (codebooks are <= 256 wide). */
  def pqEncode(v: ArrayData, centers: Array[Array[Array[Float]]]): ArrayData = {
    val m = centers.length
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      val cs = centers(sub)
      val dsub = cs(0).length
      val off = sub * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v.getFloat(off + i).toDouble - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(sub) = best.toByte
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(b => b: Any))
  }

  /** ADC (asymmetric distance computation) cosine estimate from a PQ
    * code: dot(q, x̂) and |x̂|² decompose over subspaces, so both are
    * table lookups per sub-code. `dotLut(sub)(c)` = <q_sub, centroid>,
    * `normLut(sub)(c)` = |centroid|². 0.0 on zero norms, mirroring
    * [[cosine]]. */
  def pqAdc(code: ArrayData, dotLut: Array[Array[Double]],
      normLut: Array[Array[Double]], qNorm: Double): Double = {
    val m = code.numElements()
    var sumDot = 0.0
    var sumNorm = 0.0
    var sub = 0
    while (sub < m) {
      val c = code.getByte(sub) & 0xFF
      sumDot += dotLut(sub)(c)
      sumNorm += normLut(sub)(c)
      sub += 1
    }
    val denom = qNorm * math.sqrt(sumNorm)
    if (denom == 0.0) 0.0 else sumDot / denom
  }
}
