package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Vector-search operators: the reference's Euclidean LSH (M13/M14,
  * goodreads.py:370–381, 450–459) plus an IVF (inverted-file) ANN
  * index — the classic scale path: cluster the corpus once (KMeans),
  * then search only the `nprobe` nearest partitions per query, cutting
  * scored candidates from |corpus| to ~|corpus|·nprobe/nlist.
  */
object VectorSearch {

  /** M13: Euclidean bucketed random-projection LSH, seeded. `inputCol`
    * must be an ml Vector column (use array_to_vector for arrays). */
  def brpLsh(df: DataFrame, inputCol: String, bucketLength: Double = 5.0,
      numHashTables: Int = 10, seed: Long = 42L): BucketedRandomProjectionLSHModel =
    new BucketedRandomProjectionLSH()
      .setInputCol(inputCol).setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
      .fit(df)

  /** M14 (goodreads.py:377): top-n approximate neighbors of `key`. */
  def approxNearestNeighbors(model: BucketedRandomProjectionLSHModel,
      df: DataFrame, key: Vector, n: Int): DataFrame =
    model.approxNearestNeighbors(df, key, n).toDF()

  /** IVF ANN over (id, array<float>) frames.
    *
    * Build: KMeans(nlist, seed) on the corpus → per-row partition id.
    * Search: each query scores the nlist centroids (tiny, literal
    * arrays), probes its `nprobe` nearest partitions, and ranks only
    * those partitions' vectors by exact cosine. All declarative —
    * centroid scoring and partition pruning happen in codegen'd
    * expressions; the only shuffle is the partition-id equi-join.
    * Output: (query_id, neighbor_id, cos, rank ≤ k).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 1L): DataFrame = {
    val c = corpus.toDF("neighbor_id", "cv")
    val q = queries.toDF("query_id", "qv")

    val withVec = c.withColumn("__v", array_to_vector(col("cv")))
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("part")
      .fit(withVec)
    val assigned = km.transform(withVec).select("neighbor_id", "cv", "part")

    // float literals: Similarity's dot is a codegen'd array<float>
    // expression (graft.functions.FloatDot)
    val centroids: Seq[(Int, Array[Float])] =
      km.clusterCenters.toSeq.zipWithIndex.map { case (v, i) =>
        (i, v.toArray.map(_.toFloat))
      }

    // per-query centroid scores -> array<struct(cos,part)> -> top nprobe
    val scored = array(centroids.map { case (i, arr) =>
      struct(Similarity.cosine(col("qv"), lit(arr)).as("cos"), lit(i).as("part"))
    }: _*)
    val probes = slice(reverse(array_sort(scored)), 1, nprobe)
    val qProbed = q.withColumn("part", explode(probes.getField("part")))

    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    qProbed.join(assigned, Seq("part"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(Similarity.cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
