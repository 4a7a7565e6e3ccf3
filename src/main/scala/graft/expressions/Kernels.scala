package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Scalar kernels shared by interpreted `nullSafeEval` and generated code.
  *
  * All vector kernels accumulate in **float32** to reproduce the reference
  * engine's NumPy float32 arithmetic (reference: vector_store.py:291 —
  * `np.linalg.norm(index["vec"] - q, ord=2, axis=1)` over float32 slabs;
  * golden values in test/tests.py:223-224 are exact `np.float32` literals).
  *
  * Kernels take Catalyst `ArrayData` directly so generated code stays
  * allocation-free (no boxing / WrappedArray conversion as a Scala UDF
  * would incur) and remains inside whole-stage codegen.
  */
object Kernels {

  /** Euclidean (L2) distance in float32. */
  def l2(a: ArrayData, b: ArrayData): Float = {
    val n = a.numElements()
    var s = 0f
    var i = 0
    while (i < n) {
      val d = a.getFloat(i) - b.getFloat(i)
      s += d * d
      i += 1
    }
    math.sqrt(s.toDouble).toFloat
  }

  /** Squared L2 — cheaper for top-k ranking (monotone in l2). */
  def l2Sq(a: ArrayData, b: ArrayData): Float = {
    val n = a.numElements()
    var s = 0f
    var i = 0
    while (i < n) {
      val d = a.getFloat(i) - b.getFloat(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Element-wise difference `a - b` in float32 (residual vectors for
    * residual-encoding IVF-PQ; length = the shorter input, matching the
    * other kernels' permissive-length contract).
    */
  def vecSub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i) - b.getFloat(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def dot(a: ArrayData, b: ArrayData): Float = {
    val n = a.numElements()
    var s = 0f
    var i = 0
    while (i < n) {
      s += a.getFloat(i) * b.getFloat(i)
      i += 1
    }
    s
  }

  /** Cosine similarity in float32; 0 when either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Float = {
    val n = a.numElements()
    var d = 0f; var na = 0f; var nb = 0f
    var i = 0
    while (i < n) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val den = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (den == 0.0) 0f else (d / den).toFloat
  }

  /** Length of the Longest Common Subsequence.
    *
    * Bit-parallel Allison–Dix/Hyyrö formulation: O(⌈m/64⌉·n) word ops
    * instead of the classic O(m·n) cell DP — ~64× fewer operations on
    * the fuzzy-search hot path (the reference's own bottleneck is the
    * equivalent scoring loop, vector_store.py:377-382).
    */
  def lcsLen(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    if (m == 0 || n == 0) return 0
    // bitmask rows over the shorter string to minimize word count
    val (s, t) = if (m <= n) (a, b) else (b, a)
    val w = (s.length + 63) >>> 6
    // per-character match masks for the pattern string s
    val masks = new java.util.HashMap[Character, Array[Long]]()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var arr = masks.get(c)
      if (arr == null) { arr = new Array[Long](w); masks.put(c, arr) }
      arr(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    // V starts all-ones; each text char c: U = V & M[c];
    // V = (V + U) | (V - U)  with carry/borrow across words
    val v = Array.fill(w)(-1L)
    val zeros = new Array[Long](w)
    var j = 0
    while (j < t.length) {
      val mask = masks.getOrDefault(t.charAt(j), zeros)
      var carry = 0L   // addition carry
      var borrow = 0L  // subtraction borrow
      var k = 0
      while (k < w) {
        val vk = v(k)
        val u = vk & mask(k)
        val sum = vk + u + carry
        carry = if (carryOut(vk, u, carry)) 1L else 0L
        val diffFull = vk - u - borrow
        borrow = if (java.lang.Long.compareUnsigned(vk, u) < 0 ||
          (borrow == 1L && vk == u)) 1L else 0L
        v(k) = sum | diffFull
        k += 1
      }
      j += 1
    }
    // LCS = number of zero bits in V within the first |s| positions
    var zerosCount = 0
    var k = 0
    while (k < w) {
      val limit = math.min(64, s.length - (k << 6))
      val maskBits = if (limit == 64) -1L else (1L << limit) - 1
      zerosCount += java.lang.Long.bitCount(~v(k) & maskBits)
      k += 1
    }
    zerosCount
  }

  private def carryOut(x: Long, y: Long, cin: Long): Boolean = {
    val sum = x + y
    val c1 = java.lang.Long.compareUnsigned(sum, x) < 0
    val sum2 = sum + cin
    c1 || java.lang.Long.compareUnsigned(sum2, sum) < 0
  }

  /** Indel distance (insert/delete-only edit distance) = |a|+|b| − 2·LCS.
    * This is rapidfuzz's `Indel.distance` (reference scorer
    * `rapidfuzz.fuzz.ratio`, vector_store.py:377-382).
    */
  def indelDistance(a: String, b: String): Int =
    a.length + b.length - 2 * lcsLen(a, b)

  /** rapidfuzz `fuzz.ratio` parity: 100·(1 − indel/(|a|+|b|)); 100 for two
    * empty strings. Evaluation order matters for double-parity with the
    * goldens (test/tests.py:561: 9.090909090909093).
    */
  def indelSimilarity(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) 100.0
    else 100.0 * (1.0 - indelDistance(a, b).toDouble / total.toDouble)
  }

  /** FNV-1a 64-bit hash of a string (public-domain constants). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= (s.charAt(i) & 0xffffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a 64-bit with a seed mixed in first — used to derive the k
    * independent hash functions for MinHash signatures.
    */
  def fnv1a64Seeded(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= (s.charAt(i) & 0xffffL)
      h *= 0x100000001b3L
      i += 1
    }
    // final avalanche (splitmix64 finalizer) for better bit diffusion
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** MinHash signature: for each of k seeded hash functions, the minimum
    * hash over the token set. Empty input → Long.MaxValue entries.
    */
  def minHashSignature(tokens: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i).toString
        var j = 0
        while (j < k) {
          val h = fnv1a64Seeded(t, j.toLong * 0x9e3779b97f4a7c15L)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over a token array: bitwise majority vote of the
    * tokens' 64-bit hashes.
    */
  def simHash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i).toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Equi-depth bucket assignment: index of the first boundary >= v
    * (bucket i covers (bounds(i-1), bounds(i)]; values above the last
    * boundary land in bucket bounds.length). Leftmost-match binary
    * search, so duplicate boundaries (point-mass distributions) leave
    * the duplicated buckets empty instead of splitting a tie across
    * buckets — ties MUST share a bucket for the per-bucket cumulative
    * sum to stay exact.
    */
  def bucketIndex(v: Double, bounds: Array[Double]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Rolling polynomial fingerprint (Rabin-Karp style, base 257 mod 2^64)
    * of the whole string — a cheap order-sensitive document fingerprint.
    */
  def fingerprint64(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = h * 257L + (s.charAt(i) & 0xffffL)
      i += 1
    }
    h
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Float]]()

  /** Seeded hyperplane matrix (row-major nBits × dim), cached per
    * (dim, nBits, seed) — identical generation order to the previous
    * per-plane `Array.fill(nBits)(Array.fill(dim)(nextGaussian))`.
    */
  private def planes(dim: Int, nBits: Int, seed: Long): Array[Float] = {
    val key = (dim, nBits, seed)
    val cached = planeCache.get(key)
    if (cached != null) cached
    else {
      val rnd = new scala.util.Random(seed)
      val p = new Array[Float](nBits * dim)
      var i = 0
      while (i < p.length) { p(i) = rnd.nextGaussian().toFloat; i += 1 }
      planeCache.putIfAbsent(key, p)
      planeCache.get(key)
    }
  }

  /** Sign-pattern LSH bucket: all `nBits` hyperplane dot products in ONE
    * pass over the vector (the composed per-plane form re-reads the
    * vector per plane). Products and accumulation run in DOUBLE, element
    * order per plane: a float32 accumulator leaves the sign decision a
    * ~1e-7-relative coin flip near zero, which a cross-engine oracle
    * accumulating in double can then disagree with (data-dependent gate
    * flake); double accumulation over exact float→double products pins
    * the sign to ~1e-16-relative margins and matches the ann_lsh_topk
    * oracle's double replay bit-for-bit.
    */
  def hyperplaneBucket(vec: ArrayData, dim: Int, nBits: Int, seed: Long): Long = {
    if (vec.numElements() < dim) {
      throw new IllegalArgumentException(
        s"hyperplane_bucket: vector has ${vec.numElements()} elements, expected >= $dim")
    }
    val p = planes(dim, nBits, seed)
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      val off = b * dim
      var s = 0.0
      var i = 0
      while (i < dim) { s += vec.getFloat(i).toDouble * p(off + i).toDouble; i += 1 }
      if (s > 0.0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** Unicode NFC normalization (JDK `java.text.Normalizer` — the same
    * Unicode standard ICU-based engines implement; cross-engine
    * hash-matched against DuckDB's `nfc_normalize` on the tx_nfc gate).
    * The already-normalized fast path returns the input buffer
    * unchanged — for ASCII-dominated corpora the common case is a
    * single scan, no allocation.
    */
  def nfcNormalize(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Dense matrix-vector product `out_i = sum_j m(i)(j) * v_j` —
    * double accumulation, float32 output (the OPQ rotation apply;
    * orthogonal `m` preserves L2 up to float rounding). `m` rides the
    * codegen as a reference object, so the matrix is bounded plan
    * state (`rows × dim` floats), not an expression tree.
    */
  def matVec(v: ArrayData, m: Array[Array[Float]]): ArrayData = {
    val rows = m.length
    val out = new Array[Float](rows)
    var i = 0
    while (i < rows) {
      val row = m(i)
      val n = math.min(row.length, v.numElements())
      var s = 0.0
      var j = 0
      while (j < n) { s += row(j).toDouble * v.getFloat(j).toDouble; j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-subspace PQ code assignment over a FLAT codebook
    * (`cb((s*k + c)*subDim + j)` = component `j` of code `c` in
    * subspace `s`): for each of the `m` subspaces, the argmin code by
    * float32-accumulated squared L2, ties to the LOWER code (the
    * struct-min tie rule of the literal-argmin encode). A loop kernel
    * — not an expression tree — because a k=256 codebook unrolled as
    * m×k literal structs blows past janino's method-size limit and
    * drops the whole encode projection to interpreted row-at-a-time
    * evaluation, the wrong build cost at corpus scale. The codebook
    * rides the codegen as a reference object (bounded plan state:
    * `m·k·subDim` floats).
    */
  def pqEncode(v: ArrayData, cb: Array[Float], m: Int, k: Int,
      subDim: Int): ArrayData = {
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Float.MaxValue
      var c = 0
      while (c < k) {
        val base = (s * k + c) * subDim
        var d = 0f
        var j = 0
        while (j < subDim) {
          val t = v.getFloat(s * subDim + j) - cb(base + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
