package graft.functions.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from both `eval` and generated code of the graft
  * Catalyst expressions. One tight JVM loop per row — no per-element
  * Column-expression trees, no intermediate arrays.
  */
object VectorOps {

  /** Mismatched dimensions are a data bug — silently scoring the common
    * prefix would return a plausible-but-wrong similarity, so fail loudly.
    */
  private def checkedLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector length mismatch: $n vs ${b.numElements()}")
    n
  }

  /** Cosine similarity of two numeric arrays (computed in double). */
  def cosine(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = checkedLen(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }

  def dot(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = checkedLen(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Packed sign-bit signature of dot products against `planes`. */
  def hyperplaneSig(v: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * plane(i)
        i += 1
      }
      if (s >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  // ---- xxHash64 (public-domain algorithm, Cyan4973/xxHash) ----

  private final val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private final val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private final val P3 = 1609587929392839161L
  private final val P4 = -8796714831421723037L
  private final val P5 = 2870177450012600261L

  def xxh64(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var h: Long = 0L
    var i = 0
    if (len >= 32) {
      var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = java.lang.Long.rotateLeft(v1 + getLong(bytes, i) * P2, 31) * P1
        v2 = java.lang.Long.rotateLeft(v2 + getLong(bytes, i + 8) * P2, 31) * P1
        v3 = java.lang.Long.rotateLeft(v3 + getLong(bytes, i + 16) * P2, 31) * P1
        v4 = java.lang.Long.rotateLeft(v4 + getLong(bytes, i + 24) * P2, 31) * P1
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = (h ^ java.lang.Long.rotateLeft(v1 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v2 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v3 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v4 * P2, 31) * P1) * P1 + P4
    } else h = seed + P5
    h += len
    while (i + 8 <= len) {
      h = java.lang.Long.rotateLeft(h ^ (java.lang.Long.rotateLeft(getLong(bytes, i) * P2, 31) * P1), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = java.lang.Long.rotateLeft(h ^ ((getInt(bytes, i) & 0xffffffffL) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = java.lang.Long.rotateLeft(h ^ ((bytes(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  private def getLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) | ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  private def getInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Tokenize (unicode letter/digit runs, lower-cased) + word n-gram
    * shingling + dedupe + binary sort, in one kernel. Produces the sorted
    * distinct shingle array the similarity-join verify kernels expect.
    * Semantics: n tokens or fewer -> one shingle of all tokens; empty ->
    * empty array.
    */
  private def tokenize(text: UTF8String): java.util.ArrayList[String] = {
    val s = text.toString
    val tokens = new java.util.ArrayList[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) sb.appendCodePoint(Character.toLowerCase(cp))
      else if (sb.length > 0) { tokens.add(sb.toString); sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) tokens.add(sb.toString)
    tokens
  }

  /** Lower-cased letter/digit-run tokens, order preserved, duplicates
    * kept — the tokenizer of TextFunctions.tokens as one kernel (the
    * regex-split builtin equivalent measured ~0.5 ms/doc).
    */
  def wordTokens(text: UTF8String): ArrayData = {
    val tokens = tokenize(text)
    val out = new Array[Any](tokens.size())
    var i = 0
    while (i < tokens.size()) { out(i) = UTF8String.fromString(tokens.get(i)); i += 1 }
    new GenericArrayData(out)
  }

  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = tokenize(text)
    val m = tokens.size()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    if (m <= n) {
      set.add(UTF8String.fromString(String.join(" ", tokens)))
    } else {
      val joiner = new java.lang.StringBuilder
      var j = 0
      while (j + n <= m) {
        joiner.setLength(0)
        var t = 0
        while (t < n) {
          if (t > 0) joiner.append(' ')
          joiner.append(tokens.get(j + t))
          t += 1
        }
        set.add(UTF8String.fromString(joiner.toString))
        j += 1
      }
    }
    val out = new Array[Any](set.size())
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** One-pass hashing-trick bag-of-words: md5-bucket each token (first 4
    * digest bytes big-endian unsigned mod dim — identical to parsing the
    * first 8 md5 hex chars, the engine-portable SQL form), count,
    * l2-normalize, round to 4 decimals (HALF_UP, matching Spark's round).
    * One MessageDigest reused across the row's tokens; no hex strings.
    */
  def hashedBow(tokens: ArrayData, dim: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Double](dim)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        val b32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        counts((b32 % dim).toInt) += 1.0
      }
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += counts(j) * counts(j); j += 1 }
    val norm = math.sqrt(ss)
    if (norm != 0.0) {
      j = 0
      while (j < dim) {
        counts(j) = BigDecimal(counts(j) / norm)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        j += 1
      }
    }
    new GenericArrayData(counts)
  }

  /** First 8 bytes of md5, big-endian — the engine-portable 64-bit token
    * hash: DuckDB reads the identical bit pattern via
    * `CAST(concat('0x', substring(md5(x), 1, 16)) AS UBIGINT)`, which is
    * what lets a simhash signature be replayed exactly in oracle SQL
    * (xxhash64 seeds do not transfer across engines). Slower than xxh64
    * (one digest per token) — the portable face is for gates/oracles;
    * production paths keep xxh64.
    */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  def simhash64(tokens: ArrayData): Long = simhash64(tokens, false)

  /** 64-bit SimHash over a token array: one pass, one hash per token.
    * `portable` swaps the token hash to md5Hash64 (DuckDB-replayable).
    */
  def simhash64(tokens: ArrayData, portable: Boolean): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = if (portable) md5Hash64(t.getBytes) else xxh64(t.getBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** MinHash signature: one base hash per shingle, k derived hashes via a
    * universal family h_i(x) = a_i*x + b_i (odd multipliers from
    * splitmix64), min-reduced in one pass.
    */
  def minhashSignature(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    val as = mulA(k); val bs = mulB(k)
    val n = shingles.numElements()
    if (n == 0) {
      var i = 0
      while (i < k) { sig(i) = xxh64(s"<empty>$i".getBytes("UTF-8"), i.toLong); i += 1 }
      return new GenericArrayData(sig)
    }
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      if (s != null) {
        val base = xxh64(s.getBytes, 0L)
        var i = 0
        while (i < k) {
          val h = as(i) * base + bs(i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Rolling polynomial window hashes: one 8-byte key per length-`w`
    * token window, O(n) per document. Each token is xxh64-hashed once,
    * then windows combine as h = Σ t_j · P^(w-1-j) over natural 2⁶⁴
    * wraparound, advanced in O(1) per position — no per-window string
    * build (the measured floor of the concat-then-digest formulation).
    * Cross-window collisions are ~n²/2⁶⁴, the same class as hashing the
    * joined window text.
    */
  def windowHashes(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      // nulls hash to a fixed sentinel OUTSIDE the practical xxh64 output
      // domain (the odd splitmix64 increment) rather than 0: the kernel
      // is exposed as a public SQL function (graft_window_hashes) on
      // arbitrary arrays, and a 0-sentinel would make windows differing
      // only at null positions collide deterministically instead of with
      // ~2^-64 probability. Two nulls still (intentionally) hash equal.
      th(i) = if (s == null) 0x9E3779B97F4A7C15L else xxh64(s.getBytes, 0L)
      i += 1
    }
    val P = 0x100000001b3L
    var pw = 1L
    var j = 0
    while (j < w - 1) { pw *= P; j += 1 } // P^(w-1) mod 2^64
    val out = new Array[Long](n - w + 1)
    var h = 0L
    var k = 0
    while (k < w) { h = h * P + th(k); k += 1 }
    out(0) = h
    var s = 1
    while (s <= n - w) {
      h = (h - th(s - 1) * pw) * P + th(s + w - 1)
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Intersection size of two ascending-sorted string arrays via linear
    * merge — no hash-set allocation per row (vs builtin array_intersect).
    */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      val cmp = x.compareTo(y)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Max multiplicity of any token (mode frequency) — one hash-map pass.
    * Feeds top-word-fraction repetition scoring; the builtin-composition
    * equivalent (distinct × filter) is O(unique·n) per row.
    */
  def topTokenCount(tokens: ArrayData): Int = {
    val n = tokens.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var best = 0
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val c: Int = counts.merge(t, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  /** The `nProbe` centroid indices with the highest cosine(v, centroid),
    * ranked best-first — ONE kernel call replacing the nCells-wide
    * struct-array expression (`greatest(struct(score, cell)...)` /
    * `slice(reverse(array_sort(...)))`) whose plan size grows with the
    * cell count: at FAISS-scale √n cells the expression tree becomes the
    * bottleneck, the kernel stays one reference object + one loop.
    *
    * Exact drop-in for the expression formulation it replaces: the
    * per-cell score is the [[cosine]] loop verbatim (bit-identical
    * accumulation), ranking is (score desc, cell desc) — greatest() and
    * reversed array_sort both break score ties toward the HIGHER cell
    * id — and Double.compare ranks NaN greatest like Spark's ordering.
    */
  def nearestCells(v: ArrayData, centroids: Array[Array[Double]], nProbe: Int,
      isFloat: Boolean): ArrayData = {
    val nc = centroids.length
    val scores = new Array[Double](nc)
    var ci = 0
    while (ci < nc) {
      val c = centroids(ci)
      val n = v.numElements()
      require(n == c.length,
        s"graft_nearest_cells: vector length $n != centroid length ${c.length}")
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val y = c(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      scores(ci) = if (nn == 0.0) 0.0 else dot / nn
      ci += 1
    }
    val k = math.min(nProbe, nc)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nc)
    var r = 0
    while (r < k) {
      var best = -1
      var j = 0
      while (j < nc) {
        if (!used(j) && (best < 0 || {
          val cmp = java.lang.Double.compare(scores(j), scores(best))
          cmp > 0 || (cmp == 0 && j > best)
        })) best = j
        j += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  // ---- Product quantization (PQ) kernels (Jégou et al., TPAMI 2011) ----
  // `codebooks` is flat: codebooks(sub*k + c) is centroid c of subspace sub,
  // each of length d = dim/m. All three kernels are one tight loop per row.

  /** Encode the residual (v - coarseCentroid) as m nearest-codebook-entry
    * indices (L2 per subspace) — the compressed representation stored in
    * the index (m bytes-worth instead of dim floats).
    */
  def pqEncode(v: ArrayData, centroid: ArrayData, codebooks: Array[Array[Double]],
      m: Int, k: Int, isFloat: Boolean): ArrayData = {
    val dim = checkedLen(v, centroid)
    val d = dim / m
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0; var bestDist = Double.MaxValue
      var c = 0
      while (c < k) {
        val cb = codebooks(sub * k + c)
        var dist = 0.0
        var i = 0
        while (i < d) {
          val x = (if (isFloat) v.getFloat(sub * d + i).toDouble else v.getDouble(sub * d + i)) -
            centroid.getDouble(sub * d + i) - cb(i)
          dist += x * x
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC lookup table for a query: lut(sub*k + c) = dot(q_sub, codebook_c).
    * Computed ONCE per query; every corpus row then scores in O(m) via
    * [[pqAdc]] instead of O(dim).
    */
  def pqLut(q: ArrayData, codebooks: Array[Array[Double]], m: Int, k: Int,
      isFloat: Boolean): ArrayData = {
    val dim = q.numElements()
    val d = dim / m
    val lut = new Array[Double](m * k)
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < k) {
        val cb = codebooks(sub * k + c)
        var s = 0.0
        var i = 0
        while (i < d) {
          s += (if (isFloat) q.getFloat(sub * d + i).toDouble else q.getDouble(sub * d + i)) * cb(i)
          i += 1
        }
        lut(sub * k + c) = s
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(lut)
  }

  /** Asymmetric-distance score: sum over subspaces of the query's LUT entry
    * for this row's code — the O(m) inner loop of a PQ scan.
    */
  def pqAdc(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var sub = 0
    while (sub < m) {
      s += lut.getDouble(sub * k + codes.getInt(sub))
      sub += 1
    }
    s
  }

  private val mulCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def muls(k: Int): (Array[Long], Array[Long]) =
    mulCache.computeIfAbsent(k, _ => {
      def sm(x0: Long): Long = {
        var x = x0 + 0x9e3779b97f4a7c15L
        x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
        x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
        x ^ (x >>> 31)
      }
      (Array.tabulate(k)(i => sm(i * 2654435761L) | 1L), Array.tabulate(k)(i => sm(i * 40503L + 7)))
    })
  private def mulA(k: Int): Array[Long] = muls(k)._1
  private def mulB(k: Int): Array[Long] = muls(k)._2
}
