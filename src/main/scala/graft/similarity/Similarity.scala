package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FloatVector.dotF

/** Similarity search over embedding columns (`array<float>`).
  *
  *  - `dot`/`cosine`: native codegen'd Catalyst expression
  *    (graft.functions.FloatDot) — one tight loop per pair, no
  *    intermediate arrays, whole-stage codegen preserved.
  *  - `bruteForceTopK`: exact baseline — broadcast the (small) query
  *    side, score all corpus rows, per-query top-k via window. One pass
  *    over the corpus, no shuffle of the corpus itself.
  *  - `lshCosineTopK`: random-hyperplane LSH — candidates share a
  *    signature-band bucket; shuffle is O(rows × bands) instead of
  *    O(queries × corpus). The 100 TB path.
  *  - IVF (inverted-file) variant lives in graft.ml.VectorSearch (needs
  *    KMeans centroids).
  *
  * All-pairs/top-k operators precompute each row's norm ONCE and reuse
  * it across every pair — the norm is O(dim) work identical to the dot
  * itself, so folding it into the per-pair expression would triple the
  * flop count (and did, in the first cut of this file).
  */
object Similarity {

  /** Dot product in double precision (sequential fold — deterministic,
    * matches the DuckDB oracle's list_sum ordering). */
  def dot(a: Column, b: Column): Column = dotF(a, b)

  def norm(a: Column): Column = sqrt(dotF(a, a))

  def cosine(a: Column, b: Column): Column = dotF(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for every query row.
    *
    * `queries`/`corpus`: (id, vec) frames. Query side is broadcast —
    * at scale keep the query set per-job bounded (or run LSH below).
    * Ties broken by neighbor id; self-pairs excluded when ids collide.
    * Output: (query_id, neighbor_id, cos, rank).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.toDF("query_id", "qv")
      .withColumn("qn", norm(col("qv")))
    val c = corpus.toDF("neighbor_id", "cv")
      .withColumn("cn", norm(col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random unit hyperplanes (driver-side seeded
    * RNG, shipped as literals — tiny: nBits × dim floats). Exposed
    * within the engine so the DuckDB oracle generator can inline the
    * SAME planes and reproduce signatures bit-for-bit. */
  private[graft] def hyperplanes(dim: Int, nBits: Int, seed: Long): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Sign-bit signature of `vec` against the hyperplane set. */
  private def signature(vec: Column, planes: Seq[Array[Float]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dotF(vec, lit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
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
        .withColumn(s"${idName}_n", norm(col(vecName)))
        .withColumn("sig", signature(col(vecName), planes))
      withSig.select(col(idName), col(vecName), col(s"${idName}_n"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("sig"), b * rows).bitwiseAND(mask)): _*))
          .as(Seq("band", "bh")))
    }

    val qb = banded(queries, "query_id", "qv")
    val cb = banded(corpus, "neighbor_id", "cv")
    val cand = qb.join(cb, Seq("band", "bh"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "query_id_n", "neighbor_id", "cv", "neighbor_id_n")
      .distinct()

    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .withColumn("cos", round(
        dotF(col("qv"), col("cv")) / (col("query_id_n") * col("neighbor_id_n")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** All pairs with cosine ≥ minCos (embedding near-dup detection),
    * id_a < id_b. Brute-force form (each row's norm computed once, one
    * codegen'd dot per pair); for scale swap the candidate generator
    * for lshCosineTopK's banding. */
  def cosineNearDupPairs(df: DataFrame, minCos: Double): DataFrame = {
    val n = df.toDF("id", "v").withColumn("nrm", norm(col("v")))
    val a = n.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("nrm_a"))
    val b = n.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }
}
