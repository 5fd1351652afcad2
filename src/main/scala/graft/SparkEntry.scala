package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-area packs; each pack entry is a
  * NamedQuery (Spark impl + optional DuckDB oracle SQL). Oracle-less
  * entries get the driver's weaker rows-only check (hash/non-SQL ops).
  */
object SparkEntry {

  private def packs: Seq[NamedQuery] =
    RelationalQueries.all ++ AdvancedQueries.all ++ PipelineQueries.all ++
      MultimodalQueries.all ++ GraphQueries.all ++ MlQueries.all ++
      StreamingQueries.all ++ SourceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + aggregate: lineitem ⋈ orders ⋈ customer ⋈ nation with
    * fixed-size dims broadcast. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    NamedQuery.queryMap(packs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    NamedQuery.oracleMap(packs)
}
