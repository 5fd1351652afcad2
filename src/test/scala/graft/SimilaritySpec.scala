package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine expression computes exact cosine in double precision") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
                 (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
                 (Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("bruteForceTopK returns exact nearest neighbors, self excluded") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "v")
    val got = Similarity.bruteForceTopK(vecs.filter($"id" === 0), vecs, 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got.map(_._1) == Seq(1L, 2L)) // 1 closest, then orthogonal tie broken by id
  }

  test("lshCosineTopK achieves high recall vs brute force on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshCosineTopK(q, emb, 5, dim = 64, nBits = 32, bands = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("euclideanTopK returns exact nearest by L2, ties broken by id") {
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)), (3L, Array(3f, 4f))).toDF("id", "v")
    val got = Similarity.euclideanTopK(vecs.filter($"id" === 0), vecs, 3)
      .select("neighbor_id", "dist", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L)) // 1.0, 1.0 (tie→id), 5.0
    assert(got.map(_._2).toSeq == Seq(1.0, 1.0, 5.0))
  }

  test("cosineNearDupPairsLsh: exact subset of brute force with bounded recall loss") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val brute = Similarity.cosineNearDupPairs(emb, 0.4)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.cosineNearDupPairsLsh(emb, 0.4, dim = 64)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    // precision is EXACT: every LSH pair is a brute pair with the same cosine
    assert(lsh.subsetOf(brute), s"LSH emitted pairs brute force did not: ${lsh diff brute}")
    // recall: 15 bands of 4 bits ≈ 93% at the 0.4 threshold
    assert(brute.nonEmpty && lsh.size.toDouble / brute.size >= 0.7,
      s"LSH recall too low: ${lsh.size}/${brute.size}")
    // planted exact duplicate always collides in every band
    val planted = Seq((900001L, Array.fill(64)(0.5f)), (900002L, Array.fill(64)(0.5f)))
      .toDF("id", "v")
    val got = Similarity.cosineNearDupPairsLsh(planted, 0.99, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((900001L, 900002L)))
  }

  test("ivfFixedTopK: planted duplicate lands in the probed list with cos 1") {
    val base = Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat)
    val far = Array.tabulate(64)(i => (math.cos(i * 2 + 1) * 5).toFloat)
    val vecs = Seq((1L, base), (2L, base), (3L, far)).toDF("id", "v")
    val got = Similarity.ivfFixedTopK(vecs.filter($"id" === 1), vecs, k = 1, dim = 64)
      .select("neighbor_id", "cos").as[(Long, Double)].collect()
    // identical vector → identical centroid assignment → always probed
    assert(got.toSeq == Seq((2L, 1.0)))
  }

  test("dropNearDupEmbeddingsLsh collapses a duplicate cluster to min id") {
    val base = Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat)
    val far = Array.tabulate(64)(i => (math.cos(i * 2 + 1) * 5).toFloat)
    val vecs = Seq((1L, base), (2L, base), (3L, far), (4L, base)).toDF("id", "v")
    val kept = Similarity.dropNearDupEmbeddingsLsh(vecs, minCos = 0.99, dim = 64)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // {1,2,4} collapse to 1; 3 survives
  }

  test("semDedupKept: in-cell duplicate dropped; drops are precision-exact") {
    val base = Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat)
    val far = Array.tabulate(64)(i => (math.cos(i * 2 + 1) * 5).toFloat)
    // identical vectors share a cell by construction → 2 drops against 1
    val vecs = Seq((1L, base), (2L, base), (3L, far)).toDF("id", "v")
    val kept = Similarity.semDedupKept(vecs, minCos = 0.99, dim = 64,
        nlist = 16, seed = 7L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    // real data: cell pruning loses only RECALL, never precision —
    // every dropped id must have a lower-id brute-force near-dup
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val keptReal = Similarity.semDedupKept(emb, minCos = 0.4, dim = 64,
        nlist = 16, seed = 7L)
      .select("id").as[Long].collect().toSet
    val all = emb.select("vec_id").as[Long].collect().toSet
    val dropped = all diff keptReal
    val bruteB = Similarity.cosineNearDupPairs(emb, 0.4)
      .select("id_b").as[Long].collect().toSet
    assert(dropped.subsetOf(bruteB),
      s"cell-pruned drop without a brute near-dup: ${dropped diff bruteB}")
  }

  test("ivfFilteredTopK: neighbors satisfy the predicate; true-predicate run equals ivfFixedTopK") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.select("vec_id", "embedding").filter($"vec_id" < 10)
    val corpus3 = emb.select("vec_id", "embedding", "label")
    val filt = Similarity.ivfFilteredTopK(q, corpus3, k = 5, dim = 64,
        nlist = 16, nprobe = 4, seed = 7L, keep = col("attr") % 3 === 0)
      .select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(filt.nonEmpty)
    val labelOf = emb.select("vec_id", "label").as[(Long, Int)]
      .collect().toMap
    assert(filt.forall { case (_, nb, _, _) => labelOf(nb) % 3 == 0 },
      "filtered search returned a neighbor outside the predicate")
    val noFilter = Similarity.ivfFilteredTopK(q, corpus3, k = 5, dim = 64,
        nlist = 16, nprobe = 4, seed = 7L, keep = lit(true))
      .select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val plain = Similarity.ivfFixedTopK(q,
        emb.select("vec_id", "embedding"), k = 5, dim = 64,
        nlist = 16, nprobe = 4, seed = 7L)
      .select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(noFilter == plain,
      "always-true predicate must serve exactly the unfiltered index")
  }

  test("ivfPqFilteredTopK: predicate holds on the compressed index; true predicate equals ivfPqTopK") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.select("vec_id", "embedding").filter($"vec_id" < 10)
    val corpus3 = emb.select("vec_id", "embedding", "label")
    val filt = Similarity.ivfPqFilteredTopK(q, corpus3, topK = 5, dim = 64,
        keep = col("attr") % 3 === 0)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(filt.nonEmpty)
    val labelOf = emb.select("vec_id", "label").as[(Long, Int)]
      .collect().toMap
    assert(filt.forall { case (_, nb, _, _) => labelOf(nb) % 3 == 0 },
      "filtered PQ search returned a neighbor outside the predicate")
    val noFilter = Similarity.ivfPqFilteredTopK(q, corpus3, topK = 5,
        dim = 64, keep = lit(true))
      .select("query_id", "neighbor_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val plain = Similarity.ivfPqTopK(q, emb.select("vec_id", "embedding"),
        topK = 5, dim = 64)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(noFilter == plain,
      "always-true predicate must serve exactly the unfiltered PQ index")
  }

  test("cosineNearDupPairs finds planted duplicate vector") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("id", "v")
    val got = Similarity.cosineNearDupPairs(vecs, 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("quantizeInt8: q within [-127,127], max|v| hits ±127, bounded error, zero-vector safe") {
    val vecs = Seq(
      (0L, Array(1.27f, -0.635f, 0.0f, 0.01f)),
      (1L, Array(-2.54f, 2.54f, 1.27f, -0.3f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector: scale 0, q all 0
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .select("vec_id", "scale", "q", "mse")
      .as[(Long, Double, Seq[Int], Double)].collect()
      .map(r => r._1 -> r).toMap
    got.values.foreach { case (_, scale, q, mse) =>
      assert(q.forall(x => x >= -127 && x <= 127))
      assert(scale >= 0 && mse >= 0)
      // per-element reconstruction error is at most scale/2 → mse ≤ scale²/4
      assert(mse <= scale * scale / 4 + 1e-12)
    }
    // the max-|value| element quantizes exactly to ±127
    assert(got(0L)._3.head == 127 && got(1L)._3.head == -127)
    assert(got(2L)._2 == 0.0 && got(2L)._3.forall(_ == 0) && got(2L)._4 == 0.0)
  }

  test("int8-quantized vectors preserve exact top-10 cosine neighbors (recall ≥ 0.9)") {
    // quantization feeds search: reconstruct q·scale and re-rank — the
    // top-k sets must essentially survive 8-bit compression
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").limit(300)
    val recon = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("q"), qi => (qi * col("scale")).cast("float")).as("embedding"))
    def topk(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(corpus.filter(col("vec_id") < 20), corpus, k = 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(emb)
    val quant = topk(recon)
    val recalls = exact.keys.map(q =>
      (exact(q) intersect quant.getOrElse(q, Set.empty)).size.toDouble / exact(q).size)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean top-10 recall after int8 quantization = $mean")
  }

  test("sq8AdcTopK: exact int8-representable vectors rank by exact dot; scales compose") {
    // components are integer multiples of max|v|/127, so quantization
    // is lossless and the SQ8 score equals the true dot exactly
    val vecs = Seq(
      (0L, Array(127.0f, 0.0f, 0.0f, 0.0f)),   // query
      (1L, Array(127.0f, 0.0f, 0.0f, 0.0f)),   // dot 16129
      (2L, Array(64.0f, 127.0f, 0.0f, 0.0f)),  // dot 8128
      (3L, Array(-127.0f, 0.0f, 0.0f, 0.0f)),  // dot -16129
      (4L, Array(32.0f, 0.0f, 127.0f, 0.0f)))  // dot 4064
      .toDF("vec_id", "embedding")
    val got = Similarity.sq8AdcTopK(vecs.filter(col("vec_id") === 0L), vecs, k = 4)
      .select("neighbor_id", "score", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L, 3L))
    assert(got.head._2 == 16129.0 && got.last._2 == -16129.0)
    // a rescaled corpus vector (×0.5) keeps the same integer codes but
    // half the scale: its score halves exactly
    val scaled = Seq((0L, Array(127.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Array(63.5f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val s5 = Similarity.sq8AdcTopK(scaled.filter(col("vec_id") === 0L),
        scaled, k = 1)
      .select("score").as[Double].head()
    assert(s5 == 16129.0 / 2)
  }

  test("sq8AdcTopK preserves exact top-10 dot ranking on real embeddings (recall ≥ 0.9)") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").limit(300)
    // exact full-precision DOT top-10 (the metric SQ8 approximates),
    // computed in the driver — 300 vectors, a test-only baseline
    val all = emb.as[(Long, Seq[Float])].collect()
    val exact = all.filter(_._1 < 20).map { case (q, qv) =>
      q -> all.filter(_._1 != q)
        .map { case (c, cv) =>
          (c, qv.zip(cv).map { case (a, b) => a.toDouble * b }.sum) }
        .sortBy { case (c, d) => (-d, c) }.take(10).map(_._1).toSet
    }.toMap
    val sq8 = Similarity.sq8AdcTopK(emb.filter(col("vec_id") < 20), emb, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.map(q =>
      (exact(q) intersect sq8.getOrElse(q, Set.empty)).size.toDouble / exact(q).size)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean top-10 recall of SQ8 vs exact dot = $mean")
  }

  test("pqEncode: codes in range, zero quantization error on codebook vectors") {
    val dim = 8; val m = 2; val k = 4; val seed = 11L
    val books = Similarity.pqCodebooks(dim, m, k, seed)
    // rows BUILT from codebook entries must encode to those exact
    // codes with ~zero reconstruction error
    val planted = (0 until k).map { ci =>
      (ci.toLong, books(0)(ci) ++ books(1)((ci + 1) % k))
    }.toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(planted, "vec_id", "embedding", dim, m, k, seed)
      .select("vec_id", "codes", "mse").as[(Long, Seq[Int], Double)].collect()
    got.foreach { case (id, codes, mse) =>
      assert(codes == Seq(id.toInt + 1, ((id + 1) % k).toInt + 1)) // 1-based
      assert(mse < 1e-10, s"vec $id mse=$mse")
    }
    intercept[IllegalArgumentException](
      Similarity.pqEncode(planted, "vec_id", "embedding", dim, m = 3, k, seed))
  }

  test("pqAdcTopK ranks a planted near-codebook duplicate first") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", dim = 64)
      .select("vec_id", "codes")
    val got = Similarity.pqAdcTopK(emb.filter(col("vec_id") < 10), codes,
      topK = 5, dim = 64)
    val rows = got.select("query_id", "neighbor_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    // ranks are 1..5 per query, ascending distance
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq, s"query $q")
    }
    // ADC distance of two rows sharing ALL codes is identical — the
    // quantizer is the only geometry ADC sees
    val sameCodes = codes.as[(Long, Seq[Int])].collect()
      .groupBy(_._2).filter(_._2.length >= 2)
    if (sameCodes.nonEmpty) {
      val ids = sameCodes.head._2.map(_._1).toSet
      val q0 = rows.filter(r => ids.contains(r._2)).groupBy(_._1)
      q0.values.foreach { rs =>
        val ds = rs.filter(r => ids.contains(r._2)).map(_._3).distinct
        assert(ds.length <= 1)
      }
    }
  }

  test("pqRerankTopK with a full-corpus shortlist equals exact euclideanTopK") {
    // shortK ≥ |corpus| makes stage 1 a no-op filter, so the two-stage
    // result must coincide with the exact scan — pins that the rerank
    // stage computes true distances, not ADC ones
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val n = emb.count().toInt
    val q = emb.filter(col("vec_id") < 10)
    val got = Similarity.pqRerankTopK(q, emb, shortK = n, k = 5, dim = 64)
      .select("query_id", "neighbor_id", "dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.euclideanTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id", "dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == exact)
  }

  test("ivfPqTopK at full probe equals pqAdcTopK (pruning-off sanity)") {
    // probing every list makes the IVF stage a no-op, so the composed
    // operator must coincide with the plain ADC scan — pins that the
    // composition changes WHICH candidates are scored, never HOW
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 10)
    val composed = Similarity.ivfPqTopK(q, emb, topK = 5, dim = 64,
        nlist = 8, nprobe = 8)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", dim = 64)
      .select("vec_id", "codes")
    val full = Similarity.pqAdcTopK(q, codes, topK = 5, dim = 64)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(composed.nonEmpty && composed == full)
  }

  test("ivfPqTopKPersisted serves bit-identically to the in-memory build") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 10)
    val path = graft.ScratchDirs.scratch("ivfpq_idx_spec")
    val mem = Similarity.ivfPqTopK(q, emb, topK = 5, dim = 64,
        nlist = 8, nprobe = 3)
      .as[(Long, Long, Double, Int)].collect().sorted
    val disk = graft.ml.VectorSearch.ivfPqTopKPersisted(q, emb, topK = 5,
        dim = 64, nlist = 8, nprobe = 3, m = 4, kCodes = 16,
        ivfSeed = 7L, pqSeed = 11L, path)
      .as[(Long, Long, Double, Int)].collect().sorted
    assert(mem.nonEmpty && mem.toSeq == disk.toSeq,
      s"round trip must be lossless: mem=${mem.length} disk=${disk.length}")
    // the persisted assignment rows carry codes, never float vectors —
    // the m-ints-per-vector economics is the artifact's contract
    val cols = spark.read.parquet(s"$path/assignments").columns.toSet
    assert(cols == Set("neighbor_id", "codes", "cluster"), cols.toString)
    // codebooks are frozen with the artifact
    val books = graft.ml.VectorSearch.readPqCodebooks(spark, path)
    assert(books.length == 4 && books.forall(_.length == 16))
  }

  test("appendToIvfPqIndex: append-grown coded index equals the full build row-for-row") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val cents = Similarity.hyperplanes(dim = 64, nBits = 8, seed = 7L)
    val books = Similarity.pqCodebooks(64, 4, 16, 11L)
    val path = graft.ScratchDirs.scratch("ivfpq_append_spec")
    graft.ml.VectorSearch.writeIvfPqIndex(
      Similarity.ivfPqEncodeAssign(emb.filter(col("vec_id") % 2 === 0),
        cents, 64, 4, 16, 11L),
      cents.zipWithIndex.map(_.swap), books, path)
    graft.ml.VectorSearch.appendToIvfPqIndex(
      emb.filter(col("vec_id") % 2 =!= 0), path, dim = 64)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("neighbor_id"), col("codes"), col("cluster").cast("int"))
      .as[(Long, Seq[Int], Int)].collect().sortBy(_._1).toSeq
    val grown = rows(spark.read.parquet(s"$path/assignments"))
    val full = rows(Similarity.ivfPqEncodeAssign(emb, cents, 64, 4, 16, 11L))
    assert(grown.nonEmpty && grown == full,
      s"append-grown index must equal the full build (${grown.length} vs ${full.length})")
  }

  test("mmrTopK trades relevance for diversity (picks from both clusters)") {
    // two tight clusters near the query; plain top-2 would take both
    // rows of cluster A (higher cos), MMR's diversity term pulls the
    // second pick from cluster B
    val q = Array(1.0f, 0.0f)
    val vecs = Seq(
      (1L, Array(0.99f, 0.14f)), (2L, Array(0.98f, 0.15f)), // cluster A
      (3L, Array(0.80f, 0.60f)), (4L, Array(0.79f, 0.61f))) // cluster B
      .toDF("id", "v")
    val mmr = Similarity.mmrTopK(vecs, q, k = 2, lambda = 0.3)
      .select("pos", "id").as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(mmr.head == 1L) // first pick = plain argmax relevance
    assert(mmr(1) == 3L || mmr(1) == 4L, s"second pick ${mmr(1)} not diverse")
    // λ = 1 degenerates to plain top-k by relevance
    val plain = Similarity.mmrTopK(vecs, q, k = 2, lambda = 1.0)
      .select("pos", "id").as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(plain.toSeq == Seq(1L, 2L))
    // k beyond the corpus returns every selectable row, not a crash
    assert(Similarity.mmrTopK(vecs, q, k = 10, lambda = 0.5).count() == 4)
  }

  test("semanticContaminatedIds flags clones of benchmark vectors, keeps orthogonal rows") {
    val dim = 8
    def unit(axis: Int, eps: Float = 0f): Array[Float] = {
      val a = Array.fill(dim)(eps)
      a(axis) = 1f
      a
    }
    val benchmark = Seq((100L, unit(0)), (101L, unit(1))).toDF("id", "v")
    val corpus = Seq(
      (1L, unit(0, 0.01f)),  // near-clone of benchmark 100 → flagged
      (2L, unit(1)),         // exact clone of benchmark 101 → flagged
      (3L, unit(4)),         // orthogonal → kept
      (4L, unit(5))          // orthogonal → kept
    ).toDF("id", "v")
    val flagged = Similarity.semanticContaminatedIds(corpus, benchmark,
        minCos = 0.9, dim = dim, nBits = 60, bands = 15, seed = 42L)
      .as[Long].collect().toSet
    assert(flagged == Set(1L, 2L))
    val kept = Similarity.semanticDecontaminate(corpus, benchmark, "id", "v",
        minCos = 0.9, dim = dim, nBits = 60, bands = 15, seed = 42L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }

  test("centroidAssign maps every vector of separated label groups to its own centroid") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f), 0), (1L, Array(0.9f, -0.1f), 0),
      (2L, Array(-0.1f, 1.0f), 1), (3L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidAssign(vecs, "vec_id", "embedding", "label")
      .select("id", "label", "assigned", "cos")
      .as[(Long, Int, Int, Double)].collect()
    assert(got.length == 4)
    got.foreach { case (_, label, assigned, cos) =>
      assert(assigned == label)
      assert(cos > 0.9 && cos <= 1.0)
    }
  }

  test("recallAudit: full overlap → 1.0, disjoint → 0.0, ground truth drives the rows") {
    val ex = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "neighbor_id")
    val ap = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAudit(ex, ap, k = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // query 3 exists only on the approx side → absent (no ground truth)
    assert(got == Map(1L -> ((2L, 1.0)), 2L -> ((0L, 0.0))))
  }

  test("normOutliers: a scaled vector breaks its label's fence; tight labels report none") {
    // label a: eight unit vectors + one ×40 → zero-width IQR, one
    // outlier. label b: all identical → no outlier.
    val a = (1L to 8L).map(i => (i, "a", Array(1.0f, 0.0f)))
    val b = (11L to 14L).map(i => (i, "b", Array(0.0f, 2.0f)))
    val vecs = (a :+ ((9L, "a", Array(40.0f, 0.0f)))) ++ b
    val got = Similarity.normOutliers(
        vecs.toDF("vec_id", "label", "embedding"),
        "vec_id", "embedding", "label")
      .select("label", "n_vecs", "n_outliers", "min_outlier_id")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((9L, 1L, Some(9L))))
    assert(got("b") == ((4L, 0L, None)))
  }
}
