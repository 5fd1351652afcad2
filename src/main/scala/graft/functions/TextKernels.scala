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

  /** Distinct word n-gram shingles of `text`. Null-in → handled by
    * StaticInvoke's propagateNull (never called with null).
    * Lowercasing uses the default-locale `String.toLowerCase()` — the
    * same call Spark's `lower()` bottoms out in for non-ASCII input —
    * so kernel and expression form agree char-for-char on ANY JVM
    * locale (Locale.ROOT here would diverge on e.g. tr-TR dotted I). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString.toLowerCase()
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
}
