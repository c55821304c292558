package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Partition-local JVM kernels behind the native text/vector
  * expressions. Each is a single pass over one row's data; the codegen
  * of the wrapping expressions emits a direct static call, so the whole
  * computation stays inside whole-stage codegen without the per-element
  * interpretation cost of nested higher-order Column functions (the
  * measured difference on the documents table is ~10×).
  *
  * Every kernel REPLICATES the semantics of the Column-expression
  * formulation it replaces (same tokenization, same hash, same
  * accumulation order) so existing oracle entries stay green — the
  * equivalences are asserted by NativeExpressionsSpec.
  */
object Kernels {

  private val Whitespace = Pattern.compile("\\s+")

  /** Tokens of `lower(trim(text))` split on `\s+` — exactly Spark's
    * `split(lower(trim(col)), "\\s+")`: trim removes SPACES only (not
    * all whitespace), split keeps trailing empty strings (limit -1). */
  private[expressions] def tokensOfTrimmed(lowered: String): Array[String] =
    Whitespace.split(lowered, -1)

  /** Lowercased space-trimmed text, matching `lower(trim(col))`. */
  def loweredTrimmed(text: UTF8String): String =
    text.trim().toLowerCase.toString

  // ---- md5 -------------------------------------------------------------

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex md5 of the UTF-8 bytes — Spark's `md5(col)`. */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** First 32 bits of md5 as an unsigned long —
    * `conv(substring(md5(t),1,8),16,10)` (Dedup.md5TokenHash32). */
  def md5Hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** `xxhash64(stringCol)` (seed 42). */
  def xx64(s: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(s), 42L)

  /** `pmod(xxhash64(t), 2^32)` (Dedup.xxTokenHash32). */
  def xxHash32(s: String): Long = java.lang.Math.floorMod(xx64(s), 1L << 32)

  /** Unicode NFC normalization (canonical composition) — combining
    * sequences collapse to precomposed forms so byte-level equality,
    * hashing, and dedup see one spelling per grapheme. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    // fast path: Normalizer.isNormalized is a cheap scan; most corpus
    // text is already NFC and skips the rebuild
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Highest within-document frequency of any whitespace token — the
    * numerator of the Gopher-style top-token-share repetition signal.
    * Value-identical to `explode(tokens) → groupBy(doc, token) → max`
    * (including the empty-string token a blank text tokenizes to), but
    * one partition-local pass instead of two shuffles. */
  def topTokenCount(text: UTF8String): Long = {
    val toks = tokensOfTrimmed(loweredTrimmed(text))
    if (toks.isEmpty) return 0L
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    var best = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, Integer.sum)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  // ---- shingles / fingerprints ----------------------------------------

  /** Distinct word n-gram shingles (space-joined, first-occurrence
    * order) — TextAnalysis.shingles. Fewer than n tokens → empty. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokensOfTrimmed(loweredTrimmed(text))
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-grams in order WITH multiplicity (space-joined) — the
    * non-distinct sibling of [[wordShingles]], for count-based
    * consumers (the bigram LM needs every occurrence, not the set).
    * Fewer than n tokens → empty. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val toks = tokensOfTrimmed(loweredTrimmed(text))
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Smallest md5 over the document's word n-gram shingles; documents
    * with fewer than n tokens fall back to md5 of the whole
    * lowered-trimmed text (TextAnalysis.minShingleFingerprint). Min over
    * all shingles equals min over distinct shingles, so no set is
    * built. */
  def minShingleFingerprint(text: UTF8String, n: Int): UTF8String = {
    val lowered = loweredTrimmed(text)
    val toks = tokensOfTrimmed(lowered)
    if (toks.length < n) return UTF8String.fromString(md5Hex(lowered))
    var min: String = null
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = md5Hex(sb.toString)
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  /** Rolling polynomial hash over tokens:
    * `acc = (acc * 31 + (xxhash64(tok) mod P)) mod P`, P = 1e9+7 —
    * TextAnalysis.rollingHash (pmod semantics: result in [0, P)). */
  def rollingHash(text: UTF8String): Long = {
    val toks = tokensOfTrimmed(loweredTrimmed(text))
    val P = 1000000007L
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc = java.lang.Math.floorMod(
        acc * 31L + java.lang.Math.floorMod(xx64(toks(i)), P), P)
      i += 1
    }
    acc
  }

  /** Content-defined chunking over CODE POINTS: a boundary falls after
    * 1-based position i ≥ w whenever the fixed-window polynomial hash
    * `H(i) = Σ_{j=0..w-1} cp(i−j) · base^j` is divisible by `modulus`
    * (expected chunk length ≈ modulus code points). Returns the chunk
    * texts in order; the final partial chunk is kept; empty text → no
    * chunks. The fixed window (no min-length reset) keeps every
    * boundary a LOCAL predicate of the text — the property that makes
    * CDC dedup shift-robust (an insertion far from a boundary moves no
    * other boundary) AND restatable as one scalar SQL expression per
    * position, so an external engine can recompute the chunking
    * exactly. With base 31, w ≤ 8 and code points < 0x110000 every
    * H stays far below 2^63 — no overflow on any engine. */
  def cdcChunks(text: UTF8String, w: Int, base: Long, modulus: Int)
      : ArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    val charOff = new Array[Int](n + 1)
    var ci = 0
    var k = 0
    while (ci < s.length) {
      charOff(k) = ci
      val cp = s.codePointAt(ci)
      cps(k) = cp
      ci += Character.charCount(cp)
      k += 1
    }
    charOff(n) = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prev = 0 // code-point index where the current chunk starts
    var i = w - 1 // 0-based window end = 1-based position i+1
    while (i < n) {
      var h = 0L
      var p = 1L
      var j = 0
      while (j < w) { h += cps(i - j) * p; p *= base; j += 1 }
      if (h % modulus == 0) {
        out += UTF8String.fromString(s.substring(charOff(prev), charOff(i + 1)))
        prev = i + 1
      }
      i += 1
    }
    if (prev < n)
      out += UTF8String.fromString(s.substring(charOff(prev), charOff(n)))
    new GenericArrayData(out.toArray)
  }

  /** Winnowing fingerprints (the MOSS selection scheme): over the
    * k-gram hash sequence `H(i) = (Σ_{j<k} cp(i−j)·31^j) mod 2^40`
    * (1-based end positions i = k..n — the SAME hash family as
    * [[cdcChunks]]), each window of `w` consecutive hashes selects its
    * RIGHTMOST minimum; the distinct selections are the fingerprints.
    * Selection is encoded as one packed key
    * `H·2^20 + (2^20−1−i)` — minimizing the key IS (hash asc, pos
    * desc), so the whole scheme is one sliding-window min, which is
    * exactly how the SQL oracle restates it. Selected positions are
    * non-decreasing as the window slides, so dedup is a last-pos
    * check. Returns packed `H·2^20 + i` longs in position order;
    * documents with fewer than w hash positions yield none. Guarantees
    * (the winnowing theorem): any shared substring of length ≥ k+w−1
    * yields a shared fingerprint. */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = if (s.isEmpty) 0 else s.codePointCount(0, s.length)
    if (n < k || n - k + 1 < w)
      return new GenericArrayData(Array.empty[Any])
    require(n < 1048576, "winnowing position overflows the 20-bit pack")
    val cps = new Array[Int](n)
    var ci = 0
    var t = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci); cps(t) = cp
      ci += Character.charCount(cp); t += 1
    }
    val m = n - k + 1 // hash positions: 1-based end position i = k..n
    val keys = new Array[Long](m)
    val M40 = 1L << 40
    var x = 0
    while (x < m) {
      val i = x + k // 1-based end position
      var h = 0L
      var p = 1L
      var j = 0
      while (j < k) { h += cps(i - 1 - j) * p; p *= 31L; j += 1 }
      keys(x) = (h % M40) * 1048576L + (1048575L - i)
      x += 1
    }
    // monotone deque sliding-window min over w keys
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // deque of indices, keys increasing
    var lastPos = -1L
    var e = 0
    while (e < m) {
      while (tail > head && keys(dq(tail - 1)) >= keys(e)) tail -= 1
      dq(tail) = e; tail += 1
      if (dq(head) <= e - w) head += 1
      if (e >= w - 1) {
        val mk = keys(dq(head))
        val pos = 1048575L - (mk % 1048576L)
        if (pos != lastPos) {
          out += java.lang.Long.valueOf((mk / 1048576L) * 1048576L + pos)
          lastPos = pos
        }
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Mean token length in CODEPOINTS (Spark's `length()` counts
    * characters, not UTF-16 units) — TextAnalysis.meanWordLength; zero
    * tokens → 0.0 (unreachable after split, which yields [""] for empty
    * text, but kept for the Column formulation's `otherwise`). */
  def meanWordLength(text: UTF8String): Double = {
    val toks = tokensOfTrimmed(loweredTrimmed(text))
    if (toks.length == 0) return 0.0
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      sum += toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    sum.toDouble / toks.length.toDouble
  }

  /** Fraction of tokens contained in `stopwords` —
    * TextAnalysis.stopwordRatio. */
  def stopwordRatio(text: UTF8String,
      stopwords: java.util.Set[String]): Double = {
    val toks = tokensOfTrimmed(loweredTrimmed(text))
    if (toks.length == 0) return 0.0
    var hits = 0
    var i = 0
    while (i < toks.length) {
      if (stopwords.contains(toks(i))) hits += 1
      i += 1
    }
    hits.toDouble / toks.length.toDouble
  }

  // ---- language ID -----------------------------------------------------

  /** Marker sets matching TextAnalysis.LangMarkers. A `\b(w1|w2|…)\b`
    * match over lowered text is exactly a maximal word-character run
    * equal to some wi (all markers are alphabetic), so one run scan
    * replaces the five regex passes. */
  private val MarkerLangs: Array[String] = Array("en", "de", "es", "fr")
  // value type is the BOXED Integer so a missing key is an honest null
  // (an unboxed Int signature silently turns null into 0 — it happened
  // to behave, but only by accident of BoxesRunTime.unboxToInt)
  private val MarkerWords: java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer]()
    val profiles = Array(
      Array("the", "and", "of", "is", "to", "in", "that", "it", "for", "with"),
      Array("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"),
      Array("el", "la", "los", "las", "es", "y", "de", "que", "un", "una", "por"),
      Array("le", "la", "les", "et", "est", "un", "une", "des", "du", "que", "pour"))
    // first profile wins for shared words? NO — each word can belong to
    // several languages (es "la"/fr "la", es "que"/fr "que", en/fr …).
    // Store a bitmask of languages per word instead.
    var l = 0
    while (l < profiles.length) {
      profiles(l).foreach { w =>
        val prev: Int = { val p = m.get(w); if (p == null) 0 else p.intValue() }
        m.put(w, prev | (1 << l))
      }
      l += 1
    }
    m
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' ||
      (c >= 'A' && c <= 'Z')

  /** TextAnalysis.langId: CJK presence → "zh"; else the language with
    * the most marker-word hits (strictly-greater replacement over the
    * profile order en, de, es, fr; zero hits → "und"). */
  def langId(text: UTF8String): UTF8String = {
    val raw = text.toString
    // CJK short-circuit ([\x{4e00}-\x{9fff}] on the ORIGINAL text)
    var ci = 0
    while (ci < raw.length) {
      val c = raw.charAt(ci)
      if (c >= '一' && c <= '鿿') return UTF8String.fromString("zh")
      ci += 1
    }
    // Locale.ROOT: the default locale would diverge from the
    // locale-agnostic Spark lower() this kernel must replicate
    // (tr-TR dotless-ı would break 'in'/'it'/'is' marker matches)
    val s = raw.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Int](MarkerLangs.length)
    var i = 0
    val len = s.length
    while (i < len) {
      if (isWordChar(s.charAt(i))) {
        var j = i + 1
        while (j < len && isWordChar(s.charAt(j))) j += 1
        val mask0 = MarkerWords.get(s.substring(i, j))
        if (mask0 != null) {
          val mask: Int = mask0.intValue()
          var l = 0
          while (l < counts.length) {
            if ((mask & (1 << l)) != 0) counts(l) += 1
            l += 1
          }
        }
        i = j
      } else i += 1
    }
    var bestLang = "und"
    var bestScore = 0
    var l = 0
    while (l < counts.length) {
      if (counts(l) > bestScore) { bestScore = counts(l); bestLang = MarkerLangs(l) }
      l += 1
    }
    UTF8String.fromString(bestLang)
  }

  // ---- simhash / minhash ----------------------------------------------

  /** 32-bit SimHash over ALL whitespace tokens (duplicates vote once
    * each) — Dedup.simhashTable semantics with either token hash. */
  def simhash32(text: UTF8String, useMd5: Boolean): Long = {
    val toks = tokensOfTrimmed(loweredTrimmed(text))
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = if (useMd5) md5Hash32(toks(i)) else xxHash32(toks(i))
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** k-element MinHash signature over a shingle ARRAY column —
    * Dedup.minhashSignatureTable values: per seed,
    * `min over shingles of xxhash64(xxhash64(shingle) XOR seed)`.
    * Empty input → null (handled by the wrapping expression). */
  def minhashSig(shingles: ArrayData, seedArr: Array[Long]): ArrayData = {
    val n = shingles.numElements()
    val k = seedArr.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(base ^ seedArr(j), 42L)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  // ---- vector kernels --------------------------------------------------

  /** Cosine similarity of two double-array columns with zero-norm guard
    * (Ann.cosine): sequential accumulation in element order — the exact
    * summation order of the Column fold it replaces, so results are
    * bit-identical. Returns null when either norm is zero. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // norms must also cover elements beyond the shared prefix (norm(a)
    // folds over ALL of a) — equal-length vectors skip these loops
    var j = n
    while (j < a.numElements()) { val x = a.getDouble(j); na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = b.getDouble(j); nb += y * y; j += 1 }
    val sna = math.sqrt(na)
    val snb = math.sqrt(nb)
    if (sna > 0.0 && snb > 0.0) java.lang.Double.valueOf(dot / (sna * snb))
    else null
  }

  /** L2-normalized copy of a float/double array; null on zero norm.
    * One pass for the norm (sequential order — matches the Column
    * fold), one for the division: O(d), not the O(d²) of a norm
    * aggregate inlined into a per-element lambda. */
  def l2normalize(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      ss += x * x
      i += 1
    }
    if (!(ss > 0.0)) return null
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x / norm
      i += 1
    }
    new GenericArrayData(out)
  }
}
