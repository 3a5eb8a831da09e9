package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Imperative kernels behind the native expressions — the pattern Spark
  * itself uses (generated code calls a static method, e.g. xxhash64 →
  * XXH64): whole-stage codegen stays intact, the hot loop is hand-written
  * JVM code with zero per-row allocation beyond the output.
  *
  * Semantics intentionally match the composed higher-order-function
  * reference implementations in [[graft.ops.DedupOps]] (kept as the
  * executable spec): word shingles are the space-joined n-grams, hashed
  * with Spark's XXH64 (seed 42) and reduced mod 2^31-1.
  */
object HashKernels {

  val MinHashPrime: Long = 2147483647L // 2^31 - 1

  /** Distinct 31-bit hashes of word n-gram shingles, computed by walking
    * the UTF-8 bytes once: shingle i spans token i..i+n-1 INCLUDING the
    * separating single spaces, so its bytes equal the array_join'd string
    * and the hash matches `xxhash64(array_join(slice(tokens,i,n), ' '))`
    * exactly.
    */
  def shingleHashes31(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes // may copy if not array-backed; one pass after
    val len = bytes.length
    if (len == 0) return Array.emptyLongArray
    // token start offsets (split on single space, like split(text, ' '))
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < n) return Array.emptyLongArray
    val starts = new Array[Int](nTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1 // sentinel: token k spans [starts(k), starts(k+1)-2]
    val out = new Array[Long](nTokens - n + 1)
    val seen = new java.util.HashSet[Long](out.length * 2)
    var k = 0
    var m = 0
    while (k <= nTokens - n) {
      val from = starts(k)
      val until = starts(k + n) - 1 // exclusive: drop the trailing space
      val h = Math.floorMod(
        XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, 42L),
        MinHashPrime)
      if (seen.add(h)) { out(m) = h; m += 1 }
      k += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** Like [[shingleHashes31]] but full-width xxhash64 (for SimHash). */
  def shingleHashes64(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    val len = bytes.length
    if (len == 0) return Array.emptyLongArray
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < n) return Array.emptyLongArray
    val starts = new Array[Int](nTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1
    val out = new Array[Long](nTokens - n + 1)
    val seen = new java.util.HashSet[Long](out.length * 2)
    var k = 0
    var m = 0
    while (k <= nTokens - n) {
      val from = starts(k)
      val until = starts(k + n) - 1
      val h = XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      k += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** Deterministic affine-hash parameters (must mirror
    * DedupOps.hashParams: same seed → same constants). */
  def affineParams(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = (rnd.nextLong() & Long.MaxValue) % (MinHashPrime - 1) + 1
      bs(i) = (rnd.nextLong() & Long.MaxValue) % MinHashPrime
      i += 1
    }
    (as, bs)
  }

  /** MinHash signature over pre-computed 31-bit shingle hashes. */
  def minHashSignature(hashes: Array[Long], as: Array[Long], bs: Array[Long]): Array[Long] = {
    val k = as.length
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = as(i)
      val b = bs(i)
      var min = Long.MaxValue
      var j = 0
      while (j < hashes.length) {
        val v = (a * hashes(j) + b) % MinHashPrime // fits: a,x < 2^31
        if (v < min) min = v
        j += 1
      }
      sig(i) = min
      i += 1
    }
    sig
  }

  /** SimHash64 over pre-computed 64-bit shingle hashes: per-bit sign vote. */
  def simHash64(hashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Deterministic sign-LSH hyperplanes for `tables` tables of `numPlanes`
    * planes each, flattened [table][plane][dim]. Must mirror
    * SimilarityOps.hyperplanes exactly: per-table seed = seed + 1000·t,
    * gaussian draws in plane-major order — same seed, same planes.
    */
  def lshPlanes(dim: Int, numPlanes: Int, tables: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](tables * numPlanes * dim)
    var i = 0
    var t = 0
    while (t < tables) {
      val rnd = new scala.util.Random(seed + 1000L * t)
      var j = 0
      while (j < numPlanes * dim) { out(i) = rnd.nextGaussian(); i += 1; j += 1 }
      t += 1
    }
    out
  }

  /** Per-table sign-bucket ids of a vector: bit p of table t's bucket =
    * sign(vec · plane_{t,p}). Dot products accumulate in double,
    * sequentially — bit-for-bit the HOF signBucket fold. */
  def signBuckets(vec: Array[Float], planes: Array[Double], dim: Int, numPlanes: Int, tables: Int): Array[Long] = {
    val out = new Array[Long](tables)
    val n = math.min(dim, vec.length)
    var off = 0
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        var dot = 0.0
        var d = 0
        while (d < n) { dot += vec(d).toDouble * planes(off + d); d += 1 }
        if (dot >= 0) bucket |= (1L << p)
        off += dim
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** The `nProbe` nearest centroids (squared L2, sequential double fold —
    * bit-for-bit the HOF probe-cell expression) of a query vector, as cell
    * ids ordered by (distance, cell id) — exactly array_sort on a
    * (dist, cell) struct followed by slice. */
  def nearestCells(vec: Array[Float], centroids: Array[Double], nLists: Int, dim: Int, nProbe: Int): Array[Int] = {
    val n = math.min(dim, vec.length)
    val dists = new Array[Double](nLists)
    var c = 0
    while (c < nLists) {
      var dist = 0.0
      var d = 0
      val off = c * dim
      while (d < n) {
        val diff = vec(d).toDouble - centroids(off + d)
        dist += diff * diff
        d += 1
      }
      dists(c) = dist
      c += 1
    }
    val k = math.min(nProbe, nLists)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nLists)
    var i = 0
    while (i < k) {
      // Double.compare orders NaN greater than every number — the same
      // total order array_sort uses in the HOF spec, so a NaN distance
      // (NaN query component) ranks last instead of crashing selection
      var best = -1
      c = 0
      while (c < nLists) {
        if (!taken(c) && (best == -1 || java.lang.Double.compare(dists(c), dists(best)) < 0)) {
          best = c // ascending scan: ties keep the lower cell id
        }
        c += 1
      }
      taken(best) = true
      out(i) = best
      i += 1
    }
    out
  }

  /** Character-distribution Shannon entropy (nats) — bit-parity with the
    * higher-order-function spec in [[graft.ops.TextOps.charEntropy]]:
    * distinct characters in first-occurrence order (array_distinct
    * semantics), p·ln(p) folded sequentially in double, ln =
    * StrictMath.log (what Spark's `log` expression calls). Returns -acc
    * exactly like the HOF's negated aggregate, so a single-character doc
    * yields the same -0.0. Empty input returns 0.0 (callers guard with
    * length >= 1, matching the HOF's NULL branch).
    *
    * The HOF formulation is O(len·alphabet) *interpreted* lambda calls per
    * row; this is one byte scan plus an alphabet-sized fold — the
    * structural fix for the txt11 hot spot.
    */
  def charEntropy(text: UTF8String): Double = {
    val bytes = text.getBytes
    val len = bytes.length
    if (len == 0) return 0.0
    var ascii = true
    var i = 0
    while (i < len) { if (bytes(i) < 0) { ascii = false; i = len } else i += 1 }
    if (ascii) {
      // counts indexed by byte, order = first occurrence (what
      // array_distinct(split(text, '')) iterates)
      val counts = new Array[Int](128)
      val order = new Array[Int](128)
      var m = 0
      i = 0
      while (i < len) {
        val c = bytes(i)
        if (counts(c) == 0) { order(m) = c; m += 1 }
        counts(c) += 1
        i += 1
      }
      val n = len.toDouble
      var acc = 0.0
      var j = 0
      while (j < m) {
        val p = counts(order(j)) / n
        acc += p * StrictMath.log(p)
        j += 1
      }
      -acc
    } else {
      // general path: split(text, '') elements are code points (Java regex
      // zero-width split never bisects a surrogate pair)
      val s = text.toString
      val order = new java.util.LinkedHashMap[Integer, Array[Int]]()
      var k = 0
      var total = 0
      while (k < s.length) {
        val cp = s.codePointAt(k)
        k += Character.charCount(cp)
        total += 1
        val cnt = order.get(cp)
        if (cnt == null) order.put(cp, Array(1)) else cnt(0) += 1
      }
      val n = total.toDouble
      var acc = 0.0
      val it = order.values().iterator()
      while (it.hasNext) {
        val p = it.next()(0) / n
        acc += p * StrictMath.log(p)
      }
      -acc
    }
  }

  /** Exact count of DISTINCT word n-gram shingles — the native equivalent
    * of `size(DedupOps.shingles(text, n))` for the repetition filter.
    * Distinctness is by shingle STRING equality (UTF8String views over the
    * source bytes, zero copies), not by hash, so a 31-bit hash collision
    * can never diverge from the `array_distinct` / `list_distinct` spec.
    */
  def distinctShingleCount(text: UTF8String, n: Int): Int = {
    val bytes = text.getBytes
    val len = bytes.length
    if (len == 0) return 0
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < n) return 0
    val starts = new Array[Int](nTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1 // sentinel: token k spans [starts(k), starts(k+1)-2]
    val total = nTokens - n + 1
    val seen = new java.util.HashSet[UTF8String](total * 2)
    var k = 0
    var m = 0
    while (k < total) {
      val from = starts(k)
      val until = starts(k + n) - 1 // exclusive: drop the trailing space
      if (seen.add(UTF8String.fromBytes(bytes, from, until - from))) m += 1
      k += 1
    }
    m
  }

  /** Bloom-filter bit insertion, shared by the build aggregate and (as the
    * executable spec) the probe side. Hash family: XXH64 (seed 42 — the
    * same hash Spark's `xxhash64` computes over a string's UTF-8 bytes)
    * double-hashed Kirsch-Mitzenmacher style: bit_i = (h + i·h2) mod m
    * with h2 forced odd so the stride never degenerates.
    */
  def bloomSet(bits: Array[Long], h: Long, numHashes: Int): Unit = {
    val numBits = bits.length.toLong * 64L
    val h2 = ((h >>> 32) << 1) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h + i.toLong * h2, numBits)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63L).toInt)
      i += 1
    }
  }

  /** Membership test against bits stored as an array<long> column value —
    * reads words in place (no per-row copy of the filter). */
  def bloomMightContain(bits: org.apache.spark.sql.catalyst.util.ArrayData, h: Long, numHashes: Int): Boolean = {
    val numBits = bits.numElements().toLong * 64L
    val h2 = ((h >>> 32) << 1) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h + i.toLong * h2, numBits)
      if ((bits.getLong((idx >>> 6).toInt) & (1L << (idx & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Does any `probeLen`-CHARACTER sliding window of `text` hit the Bloom
    * filter? Window hashes are XXH64 (seed 42) over the window's UTF-8
    * byte span, which equals `xxhash64(substring(text, c, probeLen))` —
    * the insert side hashes whole probe strings the same way, so a
    * contained probe can NEVER be missed (Bloom filters have no false
    * negatives; false positives are killed by the caller's exact verify
    * join). Cost is O(chars) hash+test per row, independent of the number
    * of probes — the structural fix over an O(|probes|·len) contains()
    * nested loop.
    */
  def bloomTextHit(text: UTF8String, bits: org.apache.spark.sql.catalyst.util.ArrayData,
      probeLen: Int, numHashes: Int): Boolean = {
    val bytes = text.getBytes
    val len = bytes.length
    if (len == 0) return false
    var ascii = true
    var i = 0
    while (i < len) { if (bytes(i) < 0) { ascii = false; i = len } else i += 1 }
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    if (ascii) {
      if (len < probeLen) return false
      var c = 0
      while (c <= len - probeLen) {
        val h = XXH64.hashUnsafeBytes(bytes, off + c, probeLen, 42L)
        if (bloomMightContain(bits, h, numHashes)) return true
        c += 1
      }
      false
    } else {
      // UTF-8: windows are probeLen CODE POINTS; hash the byte span between
      // the char-start offsets (== the substring's UTF-8 encoding)
      var nChars = 0
      i = 0
      while (i < len) {
        i += UTF8String.numBytesForFirstByte(bytes(i))
        nChars += 1
      }
      if (nChars < probeLen) return false
      val starts = new Array[Int](nChars + 1)
      var ci = 0
      i = 0
      while (i < len) {
        starts(ci) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        ci += 1
      }
      starts(nChars) = len
      var c = 0
      while (c <= nChars - probeLen) {
        val from = starts(c)
        val until = starts(c + probeLen)
        val h = XXH64.hashUnsafeBytes(bytes, off + from, until - from, 42L)
        if (bloomMightContain(bits, h, numHashes)) return true
        c += 1
      }
      false
    }
  }

  /** Cosine similarity of two float arrays with double accumulation —
    * matches SimilarityOps.cosine (sequential fold) bit-for-bit. */
  def cosineFloat(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
