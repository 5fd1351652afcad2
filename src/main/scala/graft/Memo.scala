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
  * Keys include the session's identity hash (SparkSession exposes no
  * stable public id in 4.1) so suites that cycle sessions never see a
  * frame bound to a stopped one; entries whose SparkContext has stopped
  * are purged on every access, which both releases their memory and
  * removes the (theoretical) identity-hash collision window —
  * colliding keys would require a DEAD session still in the map.
  * TrieMap.getOrElseUpdate is lock-free (safe under nested lookups); a
  * rare double-compute under races is harmless — persist() is
  * idempotent per plan.
  */
object Memo {
  private val frames = TrieMap.empty[String, (SparkSession, DataFrame)]
  private val objects = TrieMap.empty[String, (SparkSession, AnyRef)]

  private def purgeStopped(): Unit = {
    frames.filterInPlace { case (_, (s, _)) => !s.sparkContext.isStopped }
    objects.filterInPlace { case (_, (s, _)) => !s.sparkContext.isStopped }
  }

  /** Memoize + persist a DataFrame for the lifetime of `spark`. */
  def df(spark: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
    purgeStopped()
    frames.getOrElseUpdate(s"${System.identityHashCode(spark)}|$key",
      (spark, mk.persist()))._2
  }

  /** Memoize an arbitrary session-scoped object (e.g. a PropertyGraph). */
  def obj[T <: AnyRef](spark: SparkSession, key: String)(mk: => T): T = {
    purgeStopped()
    objects.getOrElseUpdate(s"${System.identityHashCode(spark)}|$key",
      (spark, mk))._2.asInstanceOf[T]
  }
}
