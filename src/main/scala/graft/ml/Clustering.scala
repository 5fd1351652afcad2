package graft.ml

import org.apache.spark.ml.clustering.{KMeans, LDA, PowerIterationClustering}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering + topic models from the reference (M11, M12, M16, M20;
  * goodreads.py:346–353, 385–411, 632–643) with mandatory seeds. */
object Clustering {

  /** M11 (goodreads.py:346): seeded KMeans; returns input + "cluster". */
  def kmeans(df: DataFrame, featuresCol: String, k: Int, seed: Long = 1L): DataFrame =
    new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol(featuresCol).setPredictionCol("cluster")
      .fit(df).transform(df)

  /** M12 (goodreads.py:351–353): silhouette with squared euclidean. */
  def silhouette(predictions: DataFrame, featuresCol: String,
      predictionCol: String = "cluster"): Double =
    new ClusteringEvaluator()
      .setFeaturesCol(featuresCol).setPredictionCol(predictionCol)
      .setMetricName("silhouette").setDistanceMeasure("squaredEuclidean")
      .evaluate(predictions)

  /** M16 (goodreads.py:392–400): LDA topic model over count vectors;
    * returns (model topics description, transformed df w/ topicDistribution). */
  def lda(df: DataFrame, featuresCol: String, k: Int, maxIter: Int = 10,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val model = new LDA().setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol(featuresCol)
      .fit(df)
    val topics = model.describeTopics(3)
    (topics, model.transform(df))
  }

  /** M20 (goodreads.py:632–635): PowerIterationClustering over a
    * weighted edge list (src, dst, weight). Returns (id, cluster). */
  def pic(edges: DataFrame, k: Int, maxIter: Int = 10,
      weightCol: String = "weight"): DataFrame =
    new PowerIterationClustering().setK(k).setMaxIter(maxIter)
      .setSrcCol("src").setDstCol("dst").setWeightCol(weightCol)
      .assignClusters(edges)
}
