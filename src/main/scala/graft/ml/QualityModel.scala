package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Model-based document quality scoring — the FineWeb/DCLM-style
  * pipeline step that replaces hand-tuned rule thresholds with a
  * classifier trained over the same cheap scan-stage signals. The
  * reference notebook has no model-quality step (its quality signal is
  * the t01 heuristic); this family exists for the LLM-pipeline brief.
  *
  * Two paths, the m09 twin pattern:
  *  - [[fitScore]]: a spark.ml LogisticRegression (deterministic
  *    LBFGS from a fixed init — no RNG in the fit) trained on weak
  *    labels (the t14 Gopher rule verdicts), scored back over the
  *    corpus. Rows-only at the gate (spark.ml internals are not
  *    SQL-expressible) — its deterministic twin is [[scoreFixed]].
  *  - [[scoreFixed]]: the same feature frame pushed through a logistic
  *    unit with FIXED published weights — closed-form, fully
  *    DuckDB-oracle-checkable, and the shape a production scorer has
  *    after training is frozen (weights are artifacts, scoring is a
  *    scan-stage expression).
  *
  * Scale shape: the feature frame is one scan-stage projection per
  * document (no shuffle); training aggregates feature rows through
  * spark.ml's treeAggregate (corpus pass per iteration, bounded
  * iterations); FIXED scoring is pure scan-stage — at 100 TB the
  * frozen scorer runs in the ingest scan with zero shuffles. */
object QualityModel {

  /** Feature columns shared by BOTH paths (each rounded to 6 dp so the
    * fixed path's oracle arithmetic starts from identical decimals on
    * both engines):
    *  f_len  — min(n_tokens / 200, 1): length saturation
    *  f_stop — stopword ratio (prose-ness)
    *  f_punct— punctuation ratio (markup/code-ness)
    *  f_dup2 — duplicated-bigram fraction (repetition)
    *  f_mtl  — mean token length / 10 (word-salad skew, scaled O(1)) */
  val featureCols: Seq[String] = Seq("f_len", "f_stop", "f_punct", "f_dup2", "f_mtl")

  def features(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val meanTokLen = when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
    df.select(col(idCol).as("id"),
      round(least(size(toks).cast("double") / 200.0, lit(1.0)), 6).as("f_len"),
      round(TextOps.stopwordRatio(col(textCol), stopwords), 6).as("f_stop"),
      round(TextOps.punctRatio(col(textCol)), 6).as("f_punct"),
      TextOps.dupNgramFrac(col(textCol), 2).as("f_dup2"),
      round(meanTokLen / 10.0, 6).as("f_mtl"))
  }

  /** Frozen-weight logistic scorer: prob = σ(b + w·f), keep = prob ≥
    * `threshold`. Deterministic given the rounded feature frame; the
    * published default weights reward prose length/stopword density
    * and punish punctuation soup and bigram repetition. */
  def scoreFixed(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String],
      weights: Seq[Double] = Seq(3.0, 6.0, -8.0, -4.0, 2.0),
      bias: Double = -2.5, threshold: Double = 0.5): DataFrame = {
    require(weights.size == featureCols.size,
      s"need ${featureCols.size} weights, got ${weights.size}")
    val f = features(df, idCol, textCol, stopwords)
    val z = featureCols.zip(weights)
      .map { case (c, w) => col(c) * lit(w) }
      .foldLeft(lit(bias): Column)(_ + _)
    f.withColumn("prob", round(lit(1.0) / (lit(1.0) + exp(-z)), 4))
      .withColumn("keep", when(col("prob") >= threshold, 1L).otherwise(0L))
      .select("id", "prob", "keep")
  }

  /** Train a seeded LogisticRegression on weak labels — the t14
    * Gopher-rule verdict (`pass`) over the SAME corpus — then score
    * every document. The standard bootstrap when no human labels
    * exist: rules label the obvious cases, the model interpolates a
    * smooth score between them. Output: (id, prob 4dp, keep). Fully
    * deterministic for a fixed input (LBFGS from a fixed init on a
    * fixed dataset), pinned by MlSpec's seed-stability test; the
    * gate-checkable twin is [[scoreFixed]]. */
  def fitScore(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], minTokens: Int = 30, maxTokens: Int = 5000,
      threshold: Double = 0.5): DataFrame = {
    val feats = features(df, idCol, textCol, stopwords)
    val labels = TextOps.gopherRules(df, idCol, textCol, stopwords,
      minTokens, maxTokens, minMeanLen = 3.0, maxMeanLen = 4.8,
      minStopHits = 2).select(col("id"), col("pass").cast("double").as("label"))
    val train = feats.join(labels, Seq("id"))
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("__fv"),
      new LogisticRegression().setFeaturesCol("__fv").setLabelCol("label")
        .setMaxIter(50).setRegParam(0.01).setStandardization(true)))
    val model = pipe.fit(train)
    // vector_to_array + element_at: stays a codegen'd projection — no
    // Scala UDF in the scoring path
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(train)
      .select(col("id"),
        round(element_at(vector_to_array(col("probability")), 2), 4).as("prob"))
      .withColumn("keep", when(col("prob") >= threshold, 1L).otherwise(0L))
  }

  /** Persist a logistic quality scorer as a SERVING ARTIFACT (m19):
    * one (feature, weight) row per [[featureCols]] entry plus a
    * `__bias` row — the deployable form of ANY scorer in this
    * family, whether the frozen published weights or coefficients a
    * [[fitScore]]-style training run produced. The artifact is what
    * a corpus pipeline promotes between environments; scoring stays
    * the scan-stage σ(b + w·f) projection either way. */
  def writeModel(spark: org.apache.spark.sql.SparkSession,
      weights: Seq[Double], bias: Double, path: String): Unit = {
    require(weights.size == featureCols.size,
      s"need ${featureCols.size} weights, got ${weights.size}")
    import spark.implicits._
    (featureCols.zip(weights) :+ ("__bias" -> bias))
      .toDF("feature", "weight")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/model")
  }

  /** Load the artifact back in [[featureCols]] order — a
    * (|features|+1)-row driver fetch. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[Double], Double) = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/model")
      .as[(String, Double)].collect().toMap
    val missing = (featureCols :+ "__bias").filterNot(rows.contains)
    require(missing.isEmpty, s"quality-model artifact at $path lacks " +
      missing.mkString(", "))
    (featureCols.map(rows), rows("__bias"))
  }

  /** Score from the persisted artifact — byte-identical to
    * [[scoreFixed]] under the artifact's weights (the round-trip the
    * m19 gate pins against t19's oracle). */
  def scoreFromArtifact(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], path: String,
      threshold: Double = 0.5): DataFrame = {
    val (w, b) = readModel(df.sparkSession, path)
    scoreFixed(df, idCol, textCol, stopwords, weights = w, bias = b,
      threshold = threshold)
  }
}
