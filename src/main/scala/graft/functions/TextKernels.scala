package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels for hot text paths, invoked from Catalyst via
  * `StaticInvoke` — a codegen'd direct static call, so the whole
  * tokenize→shingle pipeline is ONE tight function per row instead of
  * a chain of interpreted higher-order array expressions
  * (split → filter → transform → slice → concat_ws → array_distinct
  * allocated five intermediate arrays per document and dominated the
  * n-gram dedup runtime at sf0.1).
  *
  * Semantics are bit-compatible with the expression form (and the
  * DuckDB oracles): lowercase, split on runs outside [a-z0-9], join n
  * consecutive tokens with single spaces, distinct preserving first
  * occurrence, empty when fewer than n tokens. Verified by a
  * scalacheck equivalence property in TextKernelsSpec.
  */
object TextKernels {

  /** Unicode NFC normalization (canonical composition) — the corpus
    * text-cleaning primitive Spark lacks as a builtin: decomposed
    * sequences (e + U+0301) fold to their composed forms (é), so
    * hashing / dedup / tokenization see ONE byte representation per
    * canonically-equal string. Matches DuckDB's `nfc_normalize`
    * (both implement Unicode canonical composition), which is what
    * makes the t11 oracle possible. ASCII fast path: ASCII is NFC by
    * construction, so the (corpus-dominant) all-ASCII case returns
    * the input object from a byte scan with NO String decode; only
    * non-ASCII rows pay the decode + isNormalized check. */
  def nfcNormalize(text: UTF8String): UTF8String = {
    if (text.isFullAscii) return text
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Replicates Spark's `lower()` dispatch (UTF8String.toLowerCase):
    * a locale-independent ASCII fast path when the string is all-ASCII
    * — so e.g. "TITLE" lowers to "title" even under a tr-TR default
    * locale, where a blanket `toLowerCase()` would produce "tıtle" —
    * and the default-locale `String.toLowerCase()` (what Spark's slow
    * path bottoms out in) only for strings with non-ASCII chars. */
  private def sparkLower(s: String): String = {
    var i = 0
    var allAscii = true
    while (i < s.length && allAscii) {
      if (s.charAt(i) >= 0x80) allAscii = false
      i += 1
    }
    if (!allAscii) return s.toLowerCase()
    val a = s.toCharArray
    var j = 0
    while (j < a.length) {
      val c = a(j)
      if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
      j += 1
    }
    new String(a)
  }

  /** Lowercased [a-z0-9]-run tokens of `text` — the ONE tokenizer
    * authority every kernel shares (the fused band kernel and
    * [[shingles]] must never drift apart: their bit-compatibility is
    * the oracle contract). */
  private def tokenize(text: UTF8String): java.util.ArrayList[String] = {
    val s = sparkLower(text.toString)
    val tokens = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      var c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        var continue = true
        while (i < len && continue) {
          c = s.charAt(i)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) i += 1
          else continue = false
        }
        tokens.add(s.substring(start, i))
      } else i += 1
    }
    tokens
  }

  /** Distinct word n-gram shingles of `text`. Null-in → handled by
    * StaticInvoke's propagateNull (never called with null).
    * Lowercasing via [[sparkLower]] — bit-compatible with Spark's
    * `lower()` (and the DuckDB oracles) on any JVM locale. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = tokenize(text)
    val m = tokens.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j + n <= m) {
      val sb = new java.lang.StringBuilder(tokens.get(j))
      var k = 1
      while (k < n) { sb.append(' ').append(tokens.get(j + k)); k += 1 }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** Ordered word n-grams WITH duplicates — the positional sibling of
    * [[shingles]] (which distincts): one entry per occurrence, in
    * document order. Backs TextOps.ngramsOrdered (repetition metrics,
    * boilerplate density) through the same one-pass tokenizer. */
  def ngrams(text: UTF8String, n: Int): ArrayData = {
    val tokens = tokenize(text)
    val m = tokens.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var j = 0
    while (j + n <= m) {
      val sb = new java.lang.StringBuilder(tokens.get(j))
      var k = 1
      while (k < n) { sb.append(' ').append(tokens.get(j + k)); k += 1 }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((h(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Portable MinHash band hashes over a shingle array — ONE tight
    * loop per row, replacing a chain of interpreted higher-order
    * expressions (numHashes × array passes) that dominated the
    * streaming near-dup scan stage.
    *
    * Bit-compatible with the expression/oracle construction
    * (TextKernelsSpec property): per shingle md5 hex, h1/h2 = first/
    * second 8 hex chars as unsigned 32-bit, minhash i = min over
    * shingles of (h1 + i·h2 + i²) mod 2147483647, band hash = md5 hex
    * of the '|'-joined decimal minhash rows of the band. Returns
    * `bands` hex strings; empty input → empty array (callers filter
    * shingle-less docs first, as the expression form does). */
  /** Fold one shingle's md5 into the minhash accumulators: h1/h2 are
    * the digest's first/second 4 bytes as unsigned 32-bit big-endian —
    * bit-identical to parsing the first/second 8 HEX chars (the form
    * the DuckDB oracles compute) without materializing a hex string.
    * Shared by the array-input and fused kernels — one authority. */
  private def accumulateMinhash(shingleBytes: Array[Byte], mins: Array[Long],
      numHashes: Int): Unit = {
    val P = 2147483647L
    val d = md5Local.get()
    d.reset()
    val h = d.digest(shingleBytes)
    val h1 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    val h2 = ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    var i = 0
    while (i < numHashes) {
      val v = (h1 + i * h2 + i.toLong * i) % P
      if (v < mins(i)) mins(i) = v
      i += 1
    }
  }

  /** md5 band hashes of the minhash signature: band b = md5 hex of the
    * '|'-joined decimal minhash rows — the same construction as the
    * oracles' concat_ws('|', …) → md5. Shared band authority. */
  private def bandHashes(mins: Array[Long], numHashes: Int,
      bands: Int): Array[Any] = {
    val rows = numHashes / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < rows) {
        if (k > 0) sb.append('|')
        sb.append(mins(b * rows + k))
        k += 1
      }
      out(b) = UTF8String.fromString(
        md5Hex(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      b += 1
    }
    out
  }

  def minhashBandsPortable(sh: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < m) {
      accumulateMinhash(sh.getUTF8String(j).getBytes, mins, numHashes)
      j += 1
    }
    new GenericArrayData(bandHashes(mins, numHashes, bands))
  }

  /** Fused text → portable MinHash band hashes: [[shingles]] and
    * [[minhashBandsPortable]] in ONE pass with NO intermediate
    * UTF8String shingle array — each distinct shingle's md5 feeds the
    * minhash accumulators directly from a reused StringBuilder. The
    * streaming near-dup scan stage evaluates this per side of the
    * self-join, so the saved per-shingle allocations count double
    * (sw04). Bit-compatible with composing the two kernels
    * (TextKernelsSpec property): distinct-shingle dedup kept — min
    * over a multiset equals min over its set, but skipping repeat
    * md5s is the point of the set. Fewer than n tokens → empty array
    * (the caller's shingle-less-doc filter contract). */
  def minhashBandsFromText(text: UTF8String, n: Int, numHashes: Int,
      bands: Int): ArrayData = {
    val tokens = tokenize(text)
    val m = tokens.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j + n <= m) {
      sb.setLength(0)
      sb.append(tokens.get(j))
      var k = 1
      while (k < n) { sb.append(' ').append(tokens.get(j + k)); k += 1 }
      val sh = sb.toString
      if (seen.add(sh))
        accumulateMinhash(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          mins, numHashes)
      j += 1
    }
    new GenericArrayData(bandHashes(mins, numHashes, bands))
  }

  /** Content-defined chunking (CDC): split `text` at positions where
    * a polynomial rolling hash over the trailing `w` CODEPOINTS
    * satisfies h % d == 0 — the rsync/LBFS boundary rule that keeps
    * chunk boundaries stable under insertions (a fixed-width chunker
    * shifts every subsequent chunk; CDC re-synchronizes within ~w
    * characters). h over window ending at i = Σ_{k=0}^{w−1}
    * cp(i−k)·B^k mod P with B = 257, P = 1e9+7 — every term integer,
    * so the oracle replays boundaries exactly with a per-position
    * lambda (Σ cp·(B^k mod P) mod P). The final position is always a
    * boundary; text shorter than w (or boundary-free) is one chunk;
    * empty text → empty array. O(n) per row via the rolling update. */
  def cdcChunks(text: UTF8String, w: Int, d: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val P = 1000000007L
    val B = 257L
    var bw1 = 1L // B^(w-1) mod P
    var k = 1
    while (k < w) { bw1 = bw1 * B % P; k += 1 }
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      h = if (i < w) (h * B + cps(i)) % P
          else (((h - cps(i - w) * bw1 % P) % P + P) % P * B + cps(i)) % P
      if (i >= w - 1 && h % d == 0 && i < n - 1) ends += (i + 1) // 1-based
      i += 1
    }
    ends += n
    val out = new Array[Any](ends.length)
    var prev = 0 // 0-based exclusive start
    var j = 0
    while (j < ends.length) {
      val e = ends(j)
      out(j) = UTF8String.fromString(new String(cps, prev, e - prev))
      prev = e
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Fused text → portable MinHash SIGNATURE (the raw mins, not band
    * hashes) — the per-row scan-stage form of
    * graft.dedup.Dedup.minhashSignaturesPortable's groupBy output,
    * bit-identical element for element (min over a row's shingle SET
    * under the same md5 double-hashing family). Streaming admission
    * (sw14) carries this on each arriving row so both the band probe
    * AND the signature-agreement verify run without any shuffle.
    * Fewer than n tokens → empty array (the shingle-less-doc
    * contract: such docs sign nothing and match nothing). */
  def minhashSigFromText(text: UTF8String, n: Int,
      numHashes: Int): ArrayData = {
    val tokens = tokenize(text)
    val m = tokens.size
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j + n <= m) {
      sb.setLength(0)
      sb.append(tokens.get(j))
      var k = 1
      while (k < n) { sb.append(' ').append(tokens.get(j + k)); k += 1 }
      val sh = sb.toString
      if (seen.add(sh))
        accumulateMinhash(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          mins, numHashes)
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Fused text → portable SimHash BAND LONGS — the per-row scan-stage
    * form of graft.dedup.Dedup.simhashPortable's groupBy output,
    * bit-identical band for band: per token OCCURRENCE (Σ ±1 per
    * occurrence ≡ the tf-weighted sum), global bit g reads bit g%4 of
    * md5 hex nibble g/4, and band b packs the signs of bits
    * 16b..16b+15 (> 0 rule, the SimHashAgg contract). Streaming
    * admission (sw29) carries this on each arriving row so the band
    * probe AND the hamming verify run without any stream-side
    * aggregation. Token-less text → EMPTY array (the batch sketch
    * drops such docs before the agg; they must sign nothing and match
    * nothing, not sketch to zeros). */
  def simhashBandsFromText(text: UTF8String): ArrayData = {
    val tokens = tokenize(text)
    if (tokens.isEmpty) return new GenericArrayData(Array.empty[Long])
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokens.size) {
      val hx = md5Hex(tokens.get(i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var g = 0
      while (g < 64) {
        val nib = Character.digit(hx.charAt(g / 4), 16)
        if (((nib >> (g % 4)) & 1) == 1) counts(g) += 1 else counts(g) -= 1
        g += 1
      }
      i += 1
    }
    val out = new Array[Any](4)
    var b = 0
    while (b < 4) {
      var v = 0L
      var k = 0
      while (k < 16) { if (counts(b * 16 + k) > 0) v |= (1L << k); k += 1 }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** The single authority for wiring [[TextKernels]] methods into
  * Catalyst plans: every caller (the Column helpers in Dedup /
  * EventStreams, the SQL registrations in graft.GraftExtensions)
  * builds its `StaticInvoke` here, so the class/method/return-type
  * binding lives in exactly one place. */
object TextKernelExprs {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

  private val StringArray = ArrayType(StringType, containsNull = false)
  private val Kernels = Class.forName("graft.functions.TextKernels")

  /** Positive foldable-int check for SQL-surface args: malformed
    * calls must fail ANALYSIS with a readable message, not blow up
    * per-row inside the kernel. */
  private def literalInt(e: Expression, name: String, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $name must be a positive INT literal, got $e")
  }

  def shingles(args: Seq[Expression]): Expression = {
    require(args.length == 2, "graft_shingles(text, n)")
    literalInt(args(1), "n", "graft_shingles")
    StaticInvoke(Kernels, StringArray, "shingles", args, returnNullable = false)
  }

  def ngrams(args: Seq[Expression]): Expression = {
    require(args.length == 2, "graft_ngrams(text, n)")
    literalInt(args(1), "n", "graft_ngrams")
    StaticInvoke(Kernels, StringArray, "ngrams", args, returnNullable = false)
  }

  def nfc(args: Seq[Expression]): Expression = {
    require(args.length == 1, "graft_nfc(text)")
    StaticInvoke(Kernels, StringType, "nfcNormalize", args, returnNullable = false)
  }

  def minhashBands(args: Seq[Expression]): Expression = {
    require(args.length == 3, "graft_minhash_bands(shingles, numHashes, bands)")
    val nh = literalInt(args(1), "numHashes", "graft_minhash_bands")
    val b = literalInt(args(2), "bands", "graft_minhash_bands")
    require(nh % b == 0, s"graft_minhash_bands: numHashes ($nh) must divide into bands ($b)")
    StaticInvoke(Kernels, StringArray, "minhashBandsPortable", args,
      returnNullable = false)
  }

  def minhashBandsText(args: Seq[Expression]): Expression = {
    require(args.length == 4,
      "graft_minhash_bands_text(text, n, numHashes, bands)")
    literalInt(args(1), "n", "graft_minhash_bands_text")
    val nh = literalInt(args(2), "numHashes", "graft_minhash_bands_text")
    val b = literalInt(args(3), "bands", "graft_minhash_bands_text")
    require(nh % b == 0,
      s"graft_minhash_bands_text: numHashes ($nh) must divide into bands ($b)")
    StaticInvoke(Kernels, StringArray, "minhashBandsFromText", args,
      returnNullable = false)
  }

  def minhashSigText(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.types.LongType
    require(args.length == 3, "graft_minhash_sig_text(text, n, numHashes)")
    literalInt(args(1), "n", "graft_minhash_sig_text")
    literalInt(args(2), "numHashes", "graft_minhash_sig_text")
    StaticInvoke(Kernels, ArrayType(LongType, containsNull = false),
      "minhashSigFromText", args, returnNullable = false)
  }

  def simhashBandsText(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.types.LongType
    require(args.length == 1, "graft_simhash_bands_text(text)")
    StaticInvoke(Kernels, ArrayType(LongType, containsNull = false),
      "simhashBandsFromText", args, returnNullable = false)
  }

  def cdcChunks(args: Seq[Expression]): Expression = {
    require(args.length == 3, "graft_cdc_chunks(text, w, d)")
    literalInt(args(1), "w", "graft_cdc_chunks")
    literalInt(args(2), "d", "graft_cdc_chunks")
    StaticInvoke(Kernels, StringArray, "cdcChunks", args,
      returnNullable = false)
  }
}
