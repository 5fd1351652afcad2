package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted feature-scaler (standardization) artifact — the serving
  * half of an ML feature pipeline: fit per-feature moments on a train
  * slice, freeze them to parquet, and z-score ANY corpus from the
  * frozen file (training features, online serving, and drift baselines
  * must all scale with the SAME constants, so the constants are an
  * artifact, not a recomputation).
  *
  * Reference scope: the reference's ML stage assembles/scales features
  * inline per notebook run (goodreads.py:421–441 builds metadata
  * features ad hoc); this module adds the production lifecycle —
  * persisted fit, exact incremental append, artifact-driven serve.
  *
  * EXACTNESS DESIGN (the part that makes the lifecycle provable): the
  * artifact stores (n, Σx, Σx²) per feature with x in EXACT scaled
  * integer space (e.g. cents, not dollars) and the sums as
  * decimal(38,0) — so moments are ASSOCIATIVE: append = write more
  * rows, merge = exact integer addition, and a scaler fit as
  * half + appended-half is BIT-IDENTICAL to one fit on the union
  * (floating-point sums would drift with partitioning/order; integer
  * sums cannot). mean/std only become doubles at serve time, via the
  * same (cast → divide → sqrt) IEEE ops every engine executes
  * identically. Per-element bound: |x_scaled| must fit a LONG (the
  * explicit cast); the square is computed in decimal space, so any
  * long-range feature is exact — no silent wrap.
  *
  * Scale shape: fit is ONE partial-aggregating scan (map-side combine,
  * 3 rows out per commit); the artifact is O(features × commits) and
  * compacts by re-aggregation; serve collects the tiny artifact to the
  * driver and scales the corpus with CONSTANT-FOLDED expressions — one
  * codegen'd projection pass, no join, no shuffle.
  */
object FeatureScaler {

  /** One partial-agg pass → (feature, n, ssum, ssumsq) moment rows.
    * `features` maps feature name → exact-scaled-integer column (the
    * caller owns the unit choice; use round() so 2-dp doubles land on
    * their intended integer). */
  def momentsOf(df: DataFrame, features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "at least one feature")
    val aggs = features.flatMap { case (name, x) =>
      val xl = x.cast("long")
      // square in DECIMAL space: a long·long product wraps silently
      // beyond |x| ≈ 3.03e9 and would corrupt the frozen artifact.
      // decimal(19,0) holds any long; the product is exact at
      // decimal(38,0) for every long input (max (2⁶³)² ≈ 8.5e37 < 1e38)
      val xd = xl.cast("decimal(19,0)")
      Seq(
        count(xl).as(s"__n_$name"),
        sum(xl.cast("decimal(38,0)")).as(s"__s_$name"),
        sum((xd * xd).cast("decimal(38,0)")).as(s"__ss_$name"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row into per-feature moment rows (stack
    // keeps this one driver-free projection)
    val stacked = features.map { case (name, _) =>
      s"'$name', __n_$name, __s_$name, __ss_$name"
    }.mkString(", ")
    row.select(expr(
      s"stack(${features.size}, $stacked) AS (feature, n, ssum, ssumsq)"))
  }

  /** Fit on `df` and freeze the artifact (overwrites any prior fit). */
  def writeScaler(df: DataFrame, features: Seq[(String, Column)],
      path: String): Unit =
    momentsOf(df, features)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)

  /** Incremental fit: moments are additive, so new data is ONE tiny
    * parquet append — no refit scan over the old corpus. Serve merges
    * commits by exact integer addition, so append ≡ full rebuild. */
  def appendScaler(df: DataFrame, features: Seq[(String, Column)],
      path: String): Unit =
    momentsOf(df, features)
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)

  /** Per-feature (mean, std) in scaled space, merged EXACTLY across
    * artifact commits before the single int→double boundary.
    * Population std (the standardization convention); a zero-variance
    * feature serves std=1 (scales to 0, never NaN). */
  def readParams(spark: SparkSession, path: String): Map[String, (Double, Double)] = {
    val merged = spark.read.parquet(path)
      .groupBy("feature")
      .agg(sum("n").as("n"), sum("ssum").as("ssum"), sum("ssumsq").as("ssumsq"))
      .collect()
    merged.map { r =>
      val n = r.getAs[Long]("n").toDouble
      val s = r.getAs[java.math.BigDecimal]("ssum").doubleValue()
      val ss = r.getAs[java.math.BigDecimal]("ssumsq").doubleValue()
      val mean = s / n
      val variance = ss / n - mean * mean
      val std = if (variance > 0d) math.sqrt(variance) else 1d
      (r.getString(0), (mean, std))
    }.toMap
  }

  /** Serve: z-score `features` of `df` from the frozen artifact. Each
    * output column `z_<name>` = (x_scaled − mean)/std rounded to
    * `scale` dp; the constants fold into the projection (no join). */
  def zscore(df: DataFrame, features: Seq[(String, Column)], path: String,
      keep: Seq[String], scale: Int = 4): DataFrame = {
    val params = readParams(df.sparkSession, path)
    val missing = features.map(_._1).filterNot(params.contains)
    require(missing.isEmpty, s"artifact $path lacks features: $missing")
    val zs = features.map { case (name, x) =>
      val (mean, std) = params(name)
      // + 0.0 normalizes IEEE -0.0 (a z just below the mean rounding
      // to zero) to 0.0 — engines disagree on the sign bit otherwise
      (round((x.cast("long").cast("double") - lit(mean)) / lit(std), scale)
        + lit(0.0)).as(s"z_$name")
    }
    df.select(keep.map(col) ++ zs: _*)
  }
}
