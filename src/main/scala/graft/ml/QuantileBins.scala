package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT quantile discretizer as a persisted artifact (m22) — the
  * binning half of the feature-transform family beside
  * [[FeatureScaler]]: fit B-quantile bin edges on a train slice,
  * freeze them, and bin ANY corpus from the frozen file (training
  * features and online serving must bucket with the same edges, so
  * the edges are an artifact, not a recomputation).
  *
  * EXACTNESS: the edge for cut k is the VALUE at sorted position
  * ⌊n·k/B⌋ under the total order (value, tieBreak) — a closed form
  * both engines replay bit-identically (edges are pass-through
  * values, never interpolated means). Binning is `Σ [x ≥ edge_k]`,
  * ties going right — one constant-folded projection at serve time.
  *
  * Scale honesty: the exact fit pays ONE global sort of the train
  * slice (row_number over a single ordering) — the price of exact,
  * reproducible edges. At 100 TB the fit runs on a sample or swaps in
  * the engine's sketch quantiles (p18's histogram path, or Spark's
  * own approxQuantile) and keeps this module's freeze/serve halves;
  * quantile edges are not additive, so refreshing the artifact is a
  * re-fit, not an append (unlike FeatureScaler's moments). */
object QuantileBins {

  /** (k, edge) rows for cuts k = 1..bins-1. Requires n ≥ bins so
    * every cut position is ≥ 1. */
  def fitEdges(train: DataFrame, valueCol: Column, tieBreak: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val spark = train.sparkSession
    import spark.implicits._
    val n = train.count()
    require(n >= bins, s"train slice ($n rows) smaller than $bins bins")
    val w = Window.orderBy(col("v").asc, col("__tb").asc)
    val ranked = train.select(valueCol.as("v"), tieBreak.as("__tb"))
      .withColumn("r", row_number().over(w))
    val pos = (1 until bins).map(k => (k, n * k / bins)).toDF("k", "r")
    ranked.join(broadcast(pos), "r").select(col("k"), col("v").as("edge"))
  }

  /** SKETCH fit — the scale path (m25): B-quantile edges from a
    * fixed-width histogram of the train slice instead of a global
    * sort. ONE partial-agg pass folds the corpus onto value-range/
    * `width` cells (map-side combine — the p18 histogram shape), the
    * cumulative walk runs in CELL space, and edge_k = width · (first
    * bucket whose cumulative count reaches the exact fit's position
    * ⌊n·k/B⌋). Each sketch edge is within `width` ABOVE the exact
    * [[fitEdges]] value (the exact edge's value lies inside the
    * chosen bucket, whose lower bound is the sketch edge... the exact
    * value is ≥ b·width and < (b+1)·width, so |sketch − exact| <
    * width) — the m22↔m25 tolerance contract. The histogram is a
    * deterministic closed form, so unlike most sketches the edges
    * themselves oracle-check EXACTLY. Same (k, edge) artifact schema:
    * [[binColumn]] serves both fits unchanged.
    *
    * At 100 TB this replaces m22's global row_number sort (the fit's
    * only scale-killer) with one shuffle onto ≤ range/width cells —
    * refresh stays a re-fit (quantile edges are not additive), but
    * the re-fit is now a cheap aggregation pass. */
  def fitEdgesSketch(train: DataFrame, valueCol: Column, bins: Int,
      width: Double): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    require(width > 0, "bucket width must be positive")
    import org.apache.spark.sql.expressions.Window
    val spark = train.sparkSession
    import spark.implicits._
    val cells = train
      .select(floor(valueCol / width).cast("long").as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
    // global windows over CELL space only (≤ range/width rows)
    val cum = cells
      .withColumn("cum", sum("cnt").over(Window.orderBy("b")))
      .withColumn("n", sum("cnt").over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    cum.crossJoin(broadcast((1 until bins).toDF("k")))
      .filter(col("cum") >=
        floor(col("n") * col("k") / lit(bins)).cast("long"))
      .groupBy("k").agg(min("b").as("b"))
      .select(col("k"), (col("b") * lit(width)).as("edge"))
  }

  /** Fit on `train` and freeze the (k, edge) artifact. */
  def writeBins(train: DataFrame, valueCol: Column, tieBreak: Column,
      bins: Int, path: String): Unit =
    fitEdges(train, valueCol, tieBreak, bins)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)

  /** Sketch-fit on `train` and freeze the same (k, edge) artifact —
    * [[binColumn]] serves either fit interchangeably. */
  def writeBinsSketch(train: DataFrame, valueCol: Column, bins: Int,
      width: Double, path: String): Unit =
    fitEdgesSketch(train, valueCol, bins, width)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)

  /** Serve: the bin index (0..B-1) of `x` from the frozen edges —
    * Σ [x ≥ edge_k], a constant-folded sum of comparisons (no join,
    * stays in codegen). */
  def binColumn(spark: SparkSession, path: String, x: Column): Column = {
    import spark.implicits._
    val edges = spark.read.parquet(path)
      .select("edge").as[Double].collect().sorted
    require(edges.nonEmpty, s"no bin edges at $path")
    edges.map(e => when(x >= lit(e), 1).otherwise(0))
      .reduce(_ + _).cast("int")
  }
}
