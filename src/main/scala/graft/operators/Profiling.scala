package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style data profiling — the ingest-QA primitive: per-column
  * row/null/distinct counts and min/max, computed in ONE aggregation
  * pass over the input (all columns' stats in a single `agg`, then
  * stacked to long format driver-free). At 100 TB this is one scan +
  * one (expanded) aggregation; min/max surface as strings so columns
  * of mixed types share a schema. */
object Profiling {

  /** One row per profiled column:
    * (col_name, n_rows, n_nulls, n_distinct, min_str, max_str). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    val total = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").as("min_str"),
      col(s"__mx_$c").as("max_str")))
    total.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
