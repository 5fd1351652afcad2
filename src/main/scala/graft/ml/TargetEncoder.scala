package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted TARGET-ENCODING artifact (m23/m24/sw34) — the categorical
  * encoder beside [[FeatureScaler]] and [[QuantileBins]]: each category
  * is replaced by an m-estimate-smoothed mean of the target, fit on the
  * TRAIN slice only (target encoding is the textbook leakage hazard —
  * encoding with statistics that saw the serve rows leaks the label,
  * so the statistics are a frozen artifact, never a recomputation).
  *
  * enc(c) = (Σy_c + m·prior) / (n_c + m), prior = Σy/n over the whole
  * train slice (Micci-Barreca 2001's m-probability estimate). An
  * UNSEEN category at serve time encodes to the prior.
  *
  * EXACTNESS: like FeatureScaler, the artifact stores (category, n,
  * Σy) with y in exact scaled-integer space and Σ as decimal(38,0) —
  * counts and sums are ASSOCIATIVE, so an append is one tiny parquet
  * write and half-fit + appended-half serves BIT-identically to a
  * single fit; the smoothed means only become doubles at serve, via a
  * fixed IEEE op sequence both engines replay. Serve collects the
  * category-sized artifact and folds the encodings into a constant
  * when-chain — one codegen'd projection, no join. */
object TargetEncoder {

  /** One partial-agg pass → (category, n, ssum) moment rows. */
  def momentsOf(df: DataFrame, catCol: Column,
      targetScaled: Column): DataFrame =
    df.select(catCol.as("category"), targetScaled.cast("long").as("__y"))
      .groupBy("category")
      .agg(count(col("__y")).as("n"),
        sum(col("__y").cast("decimal(38,0)")).as("ssum"))

  /** Fit on `train` and freeze the artifact (overwrites a prior fit). */
  def writeEncoder(train: DataFrame, catCol: Column, targetScaled: Column,
      path: String): Unit =
    momentsOf(train, catCol, targetScaled)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)

  /** Incremental fit: counts and sums are additive — one tiny append,
    * no refit scan; serve merges commits by exact integer addition. */
  def appendEncoder(batch: DataFrame, catCol: Column, targetScaled: Column,
      path: String): Unit =
    momentsOf(batch, catCol, targetScaled)
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)

  /** Serve: the smoothed encoding of `cat` from the frozen artifact,
    * in the target's SCALED units divided back by `descale` and
    * rounded to `dp` (+0.0 normalizes IEEE -0.0). The op sequence
    * (cast → + m·prior → / (n+m) → /descale) is fixed so an oracle
    * replays it bit-identically. */
  def encodeColumn(spark: SparkSession, path: String, cat: Column,
      m: Double, descale: Double, dp: Int = 4): Column = {
    val merged = spark.read.parquet(path)
      .groupBy("category")
      .agg(sum("n").as("n"), sum("ssum").as("ssum"))
      .collect()
    require(merged.nonEmpty, s"no encoder artifact at $path")
    val nTot = merged.map(_.getAs[Long]("n")).sum
    // exact decimal total, ONE int→double boundary: summing per-row
    // doubles would make the prior depend on collect order
    val sTot = merged.map(r =>
      BigDecimal(r.getAs[java.math.BigDecimal]("ssum"))).sum.toDouble
    val prior = sTot / nTot
    val encs = merged.map { r =>
      val n = r.getAs[Long]("n")
      val s = r.getAs[java.math.BigDecimal]("ssum").doubleValue()
      (r.getString(0), (s + m * prior) / (n + m) / descale)
    }
    val chain = encs.foldLeft(lit(prior / descale)) { case (acc, (k, v)) =>
      when(cat === lit(k), lit(v)).otherwise(acc)
    }
    round(chain, dp) + lit(0.0)
  }
}
