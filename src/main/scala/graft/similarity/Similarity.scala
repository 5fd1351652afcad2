package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  *  - `cosine`: pure expression (zip_with + aggregate fold in double
  *    precision) — codegen'd, no UDF, no vector conversion.
  *  - `bruteForceTopK`: exact baseline — broadcast the (small) query
  *    side, score all corpus rows, per-query top-k via window. One pass
  *    over the corpus, no shuffle of the corpus itself.
  *  - `lshCosineTopK`: random-hyperplane LSH — candidates share a
  *    signature-band bucket; shuffle is O(rows × bands) instead of
  *    O(queries × corpus). The 100 TB path.
  *  - IVF (inverted-file) variant lives in graft.ml.IvfIndex (needs
  *    KMeans centroids).
  */
object Similarity {

  /** Dot product in double precision (element-wise float→double cast
    * first, sequential left fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for every query row.
    *
    * `queries`/`corpus`: (id, vec) frames. Query side is broadcast —
    * at scale keep the query set per-job bounded (or run LSH below).
    * Ties broken by neighbor id; self-pairs excluded when ids collide.
    * Output: (query_id, neighbor_id, cos, rank).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.toDF("query_id", "qv")
    val c = corpus.toDF("neighbor_id", "cv")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random unit hyperplanes (driver-side seeded
    * RNG, shipped as literals — tiny: nBits × dim doubles). */
  private def hyperplanes(dim: Int, nBits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of `vec` against the hyperplane set. */
  private def signature(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, lit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Random-hyperplane LSH approximate top-k: rows whose signatures
    * agree on ≥1 of `bands` bands become candidates, then exact cosine
    * ranks them. Recall grows with bands; cost stays linear in rows.
    * Output: (query_id, neighbor_id, cos, rank) — rank ≤ k per query,
    * possibly fewer than k rows when buckets miss true neighbors.
    */
  def lshCosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, nBits: Int = 32, bands: Int = 8, seed: Long = 42L): DataFrame = {
    require(nBits % bands == 0)
    val rows = nBits / bands
    val planes = hyperplanes(dim, nBits, seed)
    val mask = (1L << rows) - 1

    def banded(df: DataFrame, idName: String, vecName: String) = {
      val withSig = df.toDF(idName, vecName)
        .withColumn("sig", signature(col(vecName), planes))
      withSig.select(col(idName), col(vecName),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("sig"), b * rows).bitwiseAND(mask)): _*))
          .as(Seq("band", "bh")))
    }

    val qb = banded(queries, "query_id", "qv")
    val cb = banded(corpus, "neighbor_id", "cv")
    val cand = qb.join(cb, Seq("band", "bh"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()

    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** All pairs with cosine ≥ minCos (embedding near-dup detection),
    * id_a < id_b. Brute-force form; for scale swap the candidate
    * generator for lshCosineTopK's banding. */
  def cosineNearDupPairs(df: DataFrame, minCos: Double): DataFrame = {
    val a = df.toDF("id_a", "va")
    val b = df.toDF("id_b", "vb")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }
}
