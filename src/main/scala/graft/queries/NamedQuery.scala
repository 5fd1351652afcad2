package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark (Dataset API) implementation plus,
  * when SQL-expressible, an ANSI-SQL oracle the driver runs in DuckDB
  * over the same parquet tables (see Verify.scala / the driver contract).
  *
  * Determinism rules every query here follows so the hash compare holds:
  *  - identical output column names on both sides (compare sorts by name);
  *  - a total ORDER BY on deterministic (non-floating) keys on both sides;
  *  - computed doubles rounded the same way on both sides; pass-through
  *    doubles left untouched (bit-identical from the same parquet);
  *  - no raw TimestampType outputs (cast to date or format to string —
  *    Spark micros vs DuckDB nanos would otherwise drift).
  */
final case class NamedQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object NamedQuery {
  /** Assemble packs into the SparkEntry maps. */
  def queryMap(qs: Seq[NamedQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def oracleMap(qs: Seq[NamedQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
