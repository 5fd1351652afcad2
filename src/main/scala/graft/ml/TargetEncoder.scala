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
  * category-sized artifact and either constant-folds the encodings
  * into a when-chain (low cardinality — one codegen'd projection, no
  * join) or broadcast-joins the (category, enc) table (high
  * cardinality, where a when-chain would exceed expression-tree
  * limits); [[encodeInto]] picks by artifact cardinality. */
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

  /** Merged (prior, per-category encoding) from the frozen artifact —
    * the shared serve-side read: commits merge by exact integer
    * addition, the prior totals in BigDecimal and crosses the
    * int→double boundary ONCE (per-row double sums would make the
    * prior depend on collect order). Encodings are in the target's
    * scaled units divided back by `descale`, UNROUNDED. */
  private def encodings(spark: SparkSession, path: String, m: Double,
      descale: Double): (Double, Array[(String, Double)]) = {
    val merged = spark.read.parquet(path)
      .groupBy("category")
      .agg(sum("n").as("n"), sum("ssum").as("ssum"))
      .collect()
    require(merged.nonEmpty, s"no encoder artifact at $path")
    val nTot = merged.map(_.getAs[Long]("n")).sum
    val sTot = merged.map(r =>
      BigDecimal(r.getAs[java.math.BigDecimal]("ssum"))).sum.toDouble
    val prior = sTot / nTot
    val encs = merged.map { r =>
      val n = r.getAs[Long]("n")
      val s = r.getAs[java.math.BigDecimal]("ssum").doubleValue()
      (r.getString(0), (s + m * prior) / (n + m) / descale)
    }
    (prior / descale, encs)
  }

  /** Serve: the smoothed encoding of `cat` from the frozen artifact,
    * in the target's SCALED units divided back by `descale` and
    * rounded to `dp` (+0.0 normalizes IEEE -0.0). The op sequence
    * (cast → + m·prior → / (n+m) → /descale) is fixed so an oracle
    * replays it bit-identically.
    *
    * CONSTANT-FOLDED form: the encodings become a when-chain, one
    * codegen'd projection with no join — right for low-cardinality
    * categoricals. The chain is O(categories) deep, so this caps at
    * `maxChain` and fails loudly above it: high-cardinality encoders
    * (the primary target-encoding use case) must serve through
    * [[encodeJoined]], whose broadcast join is cardinality-proof.
    * [[encodeInto]] picks the right form automatically. */
  def encodeColumn(spark: SparkSession, path: String, cat: Column,
      m: Double, descale: Double, dp: Int = 4,
      maxChain: Int = 64): Column = {
    val (priorEnc, encs) = encodings(spark, path, m, descale)
    require(encs.length <= maxChain,
      s"${encs.length} categories exceed the $maxChain-deep when-chain " +
        s"bound; serve via encodeJoined/encodeInto (broadcast join)")
    val chain = encs.foldLeft(lit(priorEnc)) { case (acc, (k, v)) =>
      when(cat === lit(k), lit(v)).otherwise(acc)
    }
    round(chain, dp) + lit(0.0)
  }

  /** Serve via BROADCAST JOIN — the high-cardinality form: the merged
    * artifact becomes a (category, enc) local relation broadcast
    * against the corpus scan (one hash probe per row, no when-chain,
    * no expression-tree depth limit); unseen categories coalesce to
    * the prior. Identical values to [[encodeColumn]] — the doubles
    * are precomputed on the driver by the same op sequence, and
    * rounding happens after the coalesce either way. */
  def encodeJoined(df: DataFrame, cat: Column, path: String, m: Double,
      descale: Double, outName: String, dp: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (priorEnc, encs) = encodings(spark, path, m, descale)
    val lut = broadcast(
      encs.toSeq.toDF("__te_cat", "__te_enc"))
    df.withColumn("__te_cat", cat)
      .join(lut, Seq("__te_cat"), "left")
      .withColumn(outName,
        round(coalesce(col("__te_enc"), lit(priorEnc)), dp) + lit(0.0))
      .drop("__te_cat", "__te_enc")
  }

  /** Serve with the form picked by artifact cardinality: at or below
    * `chainMax` distinct categories the encodings constant-fold into
    * a when-chain projection ([[encodeColumn]]); above it they serve
    * through the broadcast join ([[encodeJoined]]) — same values,
    * cardinality-proof plan. One tiny artifact read decides. */
  def encodeInto(df: DataFrame, cat: Column, path: String, m: Double,
      descale: Double, outName: String, dp: Int = 4,
      chainMax: Int = 64): DataFrame = {
    val nCat = df.sparkSession.read.parquet(path)
      .select("category").distinct().count()
    if (nCat <= chainMax)
      df.withColumn(outName,
        encodeColumn(df.sparkSession, path, cat, m, descale, dp, chainMax))
    else encodeJoined(df, cat, path, m, descale, outName, dp)
  }
}
