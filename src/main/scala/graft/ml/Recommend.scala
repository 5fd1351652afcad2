package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative filtering (reference M1–M5, goodreads.py:236–294):
  * seeded ALS + evaluation + top-k recommendation, as library calls.
  *
  * The reference sets no seeds (goodreads.py:239) and builds a 64-model
  * grid + CrossValidator it never fits (goodreads.py:258–263 — latent
  * dead code); this engine seeds everything and exposes the grid/CV
  * honestly as an OPTIONAL tuning path.
  */
object Recommend {

  /** `blocks` = ALS user/item block count (Spark default 10). Size it
    * to the data: ~one block per parallel task at scale, but 1 for
    * tiny planted fixtures — 10 blocks over 20 users is pure
    * scheduling overhead (measured 2× on the m12 CV grid). */
  def als(userCol: String, itemCol: String, ratingCol: String,
      rank: Int = 10, maxIter: Int = 10, regParam: Double = 0.1,
      seed: Long = 42L, blocks: Int = 10): ALS =
    new ALS()
      .setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setNumBlocks(blocks)
      .setNonnegative(true)             // goodreads.py:237
      .setColdStartStrategy("drop")     // goodreads.py:237
      .setSeed(seed)

  def fit(ratings: DataFrame, userCol: String, itemCol: String,
      ratingCol: String, rank: Int = 10, maxIter: Int = 10,
      regParam: Double = 0.1, seed: Long = 42L): ALSModel =
    als(userCol, itemCol, ratingCol, rank, maxIter, regParam, seed).fit(ratings)

  /** M4 (goodreads.py:250–252, 269): RMSE on a transformed test set. */
  def rmse(model: ALSModel, test: DataFrame, ratingCol: String): Double =
    new RegressionEvaluator()
      .setMetricName("rmse").setLabelCol(ratingCol).setPredictionCol("prediction")
      .evaluate(model.transform(test))

  /** M5 (goodreads.py:275): top-k per user, exploded to flat rows
    * (user, item, predicted rating) — friendlier to sinks than the
    * array<struct> shape. */
  def recommendAllUsers(model: ALSModel, k: Int): DataFrame = {
    val userCol = model.getUserCol
    model.recommendForAllUsers(k)
      .select(col(userCol), posexplode(col("recommendations")).as(Seq("rank", "rec")))
      .select(col(userCol), (col("rank") + 1).as("rank"),
        col(s"rec.${model.getItemCol}").as(model.getItemCol),
        round(col("rec.rating"), 4).as("predicted"))
  }

  /** [[recommendAllUsers]] for a BOUNDED user batch
    * (`recommendForUserSubset`) — the serving shape: a deployment
    * recommends for the users in this request batch, never the whole
    * user base (full-catalog exact top-k is users×items work by
    * definition; m27's 30× fixture put it at ~20 min/run). Same flat
    * output columns as the all-users form. */
  def recommendUserSubset(model: ALSModel, users: DataFrame,
      k: Int): DataFrame = {
    val userCol = model.getUserCol
    model.recommendForUserSubset(users, k)
      .select(col(userCol), posexplode(col("recommendations")).as(Seq("rank", "rec")))
      .select(col(userCol), (col("rank") + 1).as("rank"),
        col(s"rec.${model.getItemCol}").as(model.getItemCol),
        round(col("rec.rating"), 4).as("predicted"))
  }

  /** M2/M3 (goodreads.py:243–262): the reference's 4×4×4 grid and
    * 5-fold CV, runnable for real (`cv.fit`) unlike the reference. */
  /** `parallelism`: models evaluated concurrently (Spark default 1 —
    * serial grid search; the fits are independent, so overlap them up
    * to executor-memory limits). */
  def crossValidator(estimator: ALS, ratingCol: String,
      ranks: Seq[Int] = Seq(5, 10), maxIters: Seq[Int] = Seq(5, 10),
      regParams: Seq[Double] = Seq(0.05, 0.1), folds: Int = 3,
      parallelism: Int = 4): CrossValidator = {
    val grid = new ParamGridBuilder()
      .addGrid(estimator.rank, ranks)
      .addGrid(estimator.maxIter, maxIters)
      .addGrid(estimator.regParam, regParams)
      .build()
    new CrossValidator()
      .setEstimator(estimator)
      .setEvaluator(new RegressionEvaluator().setMetricName("rmse")
        .setLabelCol(ratingCol).setPredictionCol("prediction"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(folds)
      .setParallelism(parallelism)
      .setSeed(42L)
  }

  /** Persist a fitted ALSModel as a SERVING ARTIFACT (Spark ML's
    * native writer: user/item factor parquet + params metadata) —
    * the model analog of the scaler/encoder artifact lifecycle: fit
    * once, freeze, and let serving jobs recommend WITHOUT a refit
    * (the refit is this family's most expensive op; a serving
    * deployment must never pay it per session). The reloaded model
    * serves bit-identically — factors round-trip as parquet floats
    * (m27 + MlSpec pin reloaded ≡ in-session). */
  def saveModel(model: ALSModel, path: String): Unit =
    model.write.overwrite().save(path)

  /** Load a frozen ALSModel artifact. */
  def loadModel(path: String): ALSModel = ALSModel.load(path)

  /** Driver-side lookup in the reference (goodreads.py:280–285) —
    * exposed honestly as a point-lookup helper (one job per call). */
  def recommendForUser(model: ALSModel, userId: Long, k: Int): Array[(Int, Float)] = {
    import org.apache.spark.sql.Row
    model.recommendForAllUsers(k)
      .filter(col(model.getUserCol) === userId)
      .select(explode(col("recommendations")).as("r"))
      .select(s"r.${model.getItemCol}", "r.rating")
      .collect().map { case Row(i: Int, r: Float) => (i, r) }
  }
}
