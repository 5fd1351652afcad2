package graft.ml

import org.apache.spark.ml.clustering.{KMeans, KMeansModel, LDA, PowerIterationClustering}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering + topic models from the reference (M11, M12, M16, M20;
  * goodreads.py:346–353, 385–411, 632–643) with mandatory seeds. */
object Clustering {

  /** Partition count for iterative fit jobs: ~50k rows per partition,
    * clamped to [parallelism/8 floor 4, parallelism×2]. Iterating ~20
    * rounds over 32 near-empty partitions is pure scheduler overhead
    * (measured 3.0 s → 1.4 s at sf0.1); huge inputs still spread to
    * 2× the cluster's cores. The count() is one cheap pass (inputs here
    * are persisted feature frames). */
  private def fitParts(df: DataFrame): Int = {
    val sc = df.sparkSession.sparkContext
    val byRows = (df.count() / 50000L).toInt
    math.min(math.max(byRows, math.max(4, sc.defaultParallelism / 8)),
      sc.defaultParallelism * 2)
  }

  /** M11 (goodreads.py:346): seeded KMeans; returns input + "cluster".
    * Shrink-only: coalesce can't grow a partition count, and forcing a
    * full repartition shuffle just to widen a fit would usually cost
    * more than it saves — wide inputs keep their layout. */
  def kmeans(df: DataFrame, featuresCol: String, k: Int, seed: Long = 1L): DataFrame = {
    val target = fitParts(df)
    val in = if (target < df.rdd.getNumPartitions) df.coalesce(target) else df
    new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol(featuresCol).setPredictionCol("cluster")
      .fit(in).transform(in)
  }

  /** The model half of [[kmeans]] — fit only, for the persistence
    * lifecycle (m28): centroids freeze as an artifact and serving
    * jobs assign clusters without refitting. Same partition-count
    * discipline as [[kmeans]]. */
  def kmeansFit(df: DataFrame, featuresCol: String, k: Int,
      seed: Long = 1L): KMeansModel = {
    val target = fitParts(df)
    val in = if (target < df.rdd.getNumPartitions) df.coalesce(target) else df
    new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol(featuresCol).setPredictionCol("cluster")
      .fit(in)
  }

  /** Persist a fitted KMeansModel (centroids + params via Spark ML's
    * native writer); the reloaded model assigns bit-identically —
    * centroid doubles round-trip exactly (m28 + MlSpec pin it). */
  def saveKmeans(model: KMeansModel, path: String): Unit =
    model.write.overwrite().save(path)

  /** Load a frozen KMeansModel artifact. */
  def loadKmeans(path: String): KMeansModel = KMeansModel.load(path)

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
    * weighted edge list (src, dst, weight). Returns (id, cluster).
    *
    * The edge frame is coalesced before handoff: PIC's power iterations
    * are RDD joins where per-iteration scheduling overhead dominates at
    * high partition counts (sf0.1/local[32]: 21 s at 32 partitions vs
    * 8 s at 16). Scales with cluster parallelism.
    *
    * Init defaults to "degree" (the reference leaves the random init,
    * goodreads.py:634): the degree vector is deterministic — no random
    * init RDD — and measured 3–4× less run-to-run variance at sf0.1
    * (the random-init runs ranged 6–26 s across bench history; see
    * PERF.md). Pass "random" to mirror the reference exactly. */
  def pic(edges: DataFrame, k: Int, maxIter: Int = 10,
      weightCol: String = "weight", initMode: String = "degree"): DataFrame = {
    val p = math.max(8, edges.sparkSession.sparkContext.defaultParallelism / 2)
    new PowerIterationClustering().setK(k).setMaxIter(maxIter)
      .setInitMode(initMode)
      .setSrcCol("src").setDstCol("dst").setWeightCol(weightCol)
      .assignClusters(edges.coalesce(p))
  }
}
