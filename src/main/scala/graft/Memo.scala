package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/** Session-scoped memoization of shared intermediates.
  *
  * Bench and Verify run the whole query pack in one SparkSession; the
  * graph edge list, the ALS ratings frame, and the base table scans are
  * rebuilt by many queries. Memoizing the persisted DataFrame keys the
  * work once per (session, input-dir) — the moral equivalent of a
  * materialized view, and the pattern a 1000-executor deployment would
  * use for hot shared inputs (persist once, reference everywhere).
  *
  * The outer map is an IdentityHashMap keyed by the SparkSession
  * OBJECT — two live sessions can never collide (unlike an
  * identity-hash-code string key, which is not guaranteed unique).
  * Entries whose SparkContext has stopped are purged on every access,
  * releasing their cached frames; the map is therefore bounded by the
  * number of live sessions. Per-session maps are lock-free TrieMaps; a
  * rare double-compute under races is harmless — persist() is
  * idempotent per plan. Per-call (non-shared) intermediates belong in
  * [[Caches]] instead, which supports explicit release.
  */
object Memo {
  private val perSession =
    new java.util.IdentityHashMap[SparkSession, TrieMap[String, AnyRef]]()

  private def sessionMap(spark: SparkSession): TrieMap[String, AnyRef] =
    perSession.synchronized {
      val it = perSession.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var m = perSession.get(spark)
      if (m == null) { m = TrieMap.empty; perSession.put(spark, m) }
      m
    }

  // kind prefixes keep df/obj namespaces disjoint inside the shared
  // per-session map — an equal key string across the two entry points
  // must not alias (it did briefly, a ClassCastException trap)
  /** Memoize + persist a DataFrame for the lifetime of `spark`. */
  def df(spark: SparkSession, key: String)(mk: => DataFrame): DataFrame =
    sessionMap(spark).getOrElseUpdate(s"df|$key", mk.persist()).asInstanceOf[DataFrame]

  /** Memoize an arbitrary session-scoped object (e.g. a PropertyGraph). */
  def obj[T <: AnyRef](spark: SparkSession, key: String)(mk: => T): T =
    sessionMap(spark).getOrElseUpdate(s"obj|$key", mk).asInstanceOf[T]

  /** Memoize a DRIVER-SIZED artifact handle (a scratch path, a snapshot
    * version) that SURVIVES [[releaseTransients]]: the backing data
    * lives on disk (ScratchDirs reclaims it at JVM exit), so keeping
    * the handle across family flushes costs bytes of driver memory and
    * saves the full artifact rebuild on every post-flush re-measure —
    * the r12 g16 lesson (the isolated recheck re-paid the co-purchase
    * projection because the path memo was transient). NOT for cached
    * DataFrames or graphs — those hold executor memory and belong in
    * [[obj]]/[[df]] so flushes can release them. */
  def artifact[T <: AnyRef](spark: SparkSession, key: String)(mk: => T): T =
    sessionMap(spark).getOrElseUpdate(s"artifact|$key", mk).asInstanceOf[T]

  /** Release every memoized frame/object EXCEPT the base table scans
    * (`table|…`, `events-norm|…`): sweep harnesses call this at
    * query-family boundaries so the session-lifetime memo population
    * stays bounded by one family's working set. The r7 gate showed
    * why: with 174 queries' memos, checkpoints and cache garbage
    * accumulating unreleased, full-GC pauses landed on arbitrary
    * mid-sweep queries (d09 read 6.3 s against a 0.77 s isolated
    * floor). Safe at a boundary: entries rebuild on next use, and
    * min-of-2 timing re-warms them on run 1, so warm readings are
    * unaffected. Objects (graphs, BPE loops) are dropped without an
    * explicit unpersist — their backing frames become unreferenced
    * and the ContextCleaner reclaims the blocks on the GC the caller
    * triggers right after. */
  def releaseTransients(spark: SparkSession): Unit = {
    val m = sessionMap(spark)
    val keep = Seq("df|table|", "df|events-norm|", "artifact|")
    m.keys.toList.foreach { k =>
      if (!keep.exists(k.startsWith)) m.remove(k).foreach {
        case df: DataFrame => df.unpersist(blocking = false)
        case _ => ()
      }
    }
  }

  /** Collision-resistant memo key for a plan: 128-bit MD5 of the
    * CANONICALIZED logical plan string (attribute ids renumbered
    * positionally, so true semantic twins — and only those — share a
    * key). The 32-bit `semanticHash()` previously used here could
    * collide two same-schema plans differing only in filters/params
    * and silently serve one query's memoized result to the other.
    *
    * LocalRelation leaves canonicalize WITHOUT their rows (the plan
    * string is just the schema), so the digest also folds in each
    * local leaf's row data — two in-memory frames with one schema but
    * different literals must not share a key. Scan-based plans carry
    * their paths in the plan string and pay nothing extra; local
    * relations are driver-sized by construction, so hashing their
    * rows is cheap.
    *
    * The fold is LENGTH-PREFIXED at both grains: each leaf contributes
    * its row count and each row its byte length before its content.
    * Bare concatenation would let two different row sets whose
    * renderings concatenate identically (one row "a][b" vs rows
    * "a", "b") share a digest and serve each other's memoized
    * result — the classic ambiguous-concatenation hash bug. */
  def planKey(df: DataFrame): String = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val analyzed = df.queryExecution.analyzed
    val md = java.security.MessageDigest.getInstance("MD5")
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def lenPrefix(n: Long): Unit =
      md.update(java.nio.ByteBuffer.allocate(8).putLong(n).array())
    md.update(analyzed.canonicalized.toString.getBytes(utf8))
    analyzed.collectLeaves().foreach {
      // InternalRow.toString renders content (field values or the
      // UnsafeRow hex bytes) — content-based either way, unlike
      // GenericInternalRow.hashCode which is identity-based
      case lr: LocalRelation =>
        lenPrefix(lr.data.size.toLong)
        lr.data.foreach { r =>
          val bytes = r.toString.getBytes(utf8)
          lenPrefix(bytes.length.toLong)
          md.update(bytes)
        }
      case _ => ()
    }
    md.digest().map("%02x".format(_)).mkString
  }
}
