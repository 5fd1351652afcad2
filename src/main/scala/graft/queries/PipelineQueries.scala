package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.{Retrieval, Sampling, Sketches, TextOps}

/** Training-data pipeline queries over documents/embeddings: dedup
  * (exact, n-gram Jaccard, MinHash LSH, SimHash), similarity search
  * (brute-force + LSH ANN), and text analysis (token stats, quality,
  * language ID, fingerprints).
  *
  * Hash-based ops (xxhash64 sketches) are not DuckDB-expressible →
  * no oracle (driver rows-only check); their semantics are covered by
  * scalatest specs on planted duplicates instead.
  */
object PipelineQueries {

  private val enStop = TextOps.langMarkers.head._2

  /** The standard BM25-gate query set: first 8 tokens of every 125th
    * doc (s27's construction — the gate needs no external queries). */
  private[queries] def bm25Queries(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("doc_id") % 125 === 7)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("qtext"))

  /** s27's BM25 oracle, parameterized for the persisted-index gates:
    * `corpusFilter` restricts the SCORED corpus (tombstone gates —
    * query texts still derive from all documents), `phases` > 1 wraps
    * the top-k list in identical phase tags (serve-equality gates).
    * With no filter and one phase this is exactly s27's scoring. */
  /** The BM25 CTE chain (s27's scoring), name-prefixed so it can be
    * chained next to the IVF-PQ CTEs in one oracle without CTE-name
    * collisions: the query CTE is `${qn}` and the final ranked list
    * `${qn}rk`. `corpusFilter` restricts the SCORED corpus; query
    * texts always derive from all documents. */
  private[queries] def bm25Ctes(corpusFilter: String = "",
      qn: String = "q", queryCap: Int = 0): String = {
    val where = if (corpusFilter.isEmpty) "" else s" WHERE $corpusFilter"
    // queryCap > 0 bounds the served batch to the `queryCap` smallest
    // query ids — the s39 capped-batch serve's oracle twin
    val cap = if (queryCap <= 0) "" else
      s" AND doc_id IN (SELECT doc_id FROM tall WHERE doc_id % 125 = 7" +
        s" ORDER BY doc_id LIMIT $queryCap)"
    s"""tall AS (SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'),
       |    x -> len(x) > 0) AS ts FROM documents),
       |t AS (SELECT * FROM tall$where),
       |tf AS (SELECT doc_id, tok, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs,
       |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |$qn AS (SELECT doc_id AS query_id, unnest(list_distinct(ts[1:8])) AS tok
       |  FROM tall WHERE doc_id % 125 = 7$cap),
       |dfq AS (SELECT tok, count(*) AS df FROM tf
       |  WHERE tok IN (SELECT DISTINCT tok FROM $qn) GROUP BY 1),
       |co AS (SELECT $qn.query_id, tf.doc_id,
       |    ln(1 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
       |      (tf.tf * (1.2 + 1.0)) /
       |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS w
       |  FROM $qn JOIN tf USING (tok) JOIN dfq USING (tok)
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
       |  WHERE tf.doc_id <> $qn.query_id),
       |sc AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
       |  FROM co GROUP BY 1, 2),
       |${qn}rk AS (SELECT query_id, doc_id, score, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM sc)""".stripMargin
  }

  /** The persisted dense half of the hybrid pair (s33/s34): queries
    * are the common (documents ⋈ embeddings) ids at %125==7, served
    * from the IVF-PQ artifact at `path` with candidates
    * metadata-filtered to ids that have a documents row — ONE shared
    * index, filtered at serve time (s26's shape). Output
    * (query_id, doc_id, rank), ready for [[Retrieval.rrfFuse]].
    * Shared by s33 (fused list), s34 (overlap audit), s35 (context
    * pack) — artifact builds are memoized per (session, dir) below,
    * so any subset of queries builds what it needs exactly once. */
  private def hybridDenseServe(s: org.apache.spark.sql.SparkSession,
      dir: String, path: String): org.apache.spark.sql.DataFrame = {
    val docIds = Tables.documents(s, dir).select("doc_id")
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val codedLive = s.read.parquet(s"$path/assignments")
      .join(broadcast(docIds.select(col("doc_id").as("neighbor_id"))),
        Seq("neighbor_id"), "left_semi")
    val q = emb.filter(col("vec_id") % 125 === 7)
      .join(broadcast(docIds.select(col("doc_id").as("vec_id"))),
        Seq("vec_id"), "left_semi")
    Similarity.ivfPqServe(q.select("vec_id", "embedding"), codedLive,
        graft.ml.VectorSearch.readIvfIndexCentroids(s, path).map(_._2),
        graft.ml.VectorSearch.readPqCodebooks(s, path),
        topK = 20, nprobe = IvfProbes, dim = 64, m = PqM)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
  }

  /** ONE full-corpus postings artifact per (session, dir), shared by
    * every read-only hybrid serve (s33/s34/s35) — the production
    * shape: an index is built once and served by many queries. The
    * lifecycle gates (s30 build round-trip, s31 append, s32
    * tombstone/compaction) keep PRIVATE artifacts, because mutating
    * the artifact is exactly what they prove. writePostingsIndex is
    * mode=overwrite, so a post-release rebuild at the same scratch
    * path is safe. */
  private def sharedBm25Path(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graft.Memo.obj(s, s"bm25-idx-path|$dir") {
      val path = graft.ScratchDirs.scratch("bm25_idx_shared")
      Retrieval.writePostingsIndex(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", path)
      path
    }

  /** ONE IVF-PQ artifact per (session, dir) — the dense sibling of
    * [[sharedBm25Path]], serving s33/s34/s35's persisted dense half. */
  private def sharedIvfPqPath(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graft.Memo.obj(s, s"ivfpq-idx-path|$dir") {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val path = graft.ScratchDirs.scratch("ivfpq_idx_shared")
      val cents = Similarity.hyperplanes(dim = 64, nBits = IvfLists, seed = 7L)
      graft.ml.VectorSearch.writeIvfPqIndex(
        Similarity.ivfPqEncodeAssign(emb, cents, 64, PqM, PqK, PqSeed),
        cents.zipWithIndex.map(_.swap),
        Similarity.pqCodebooks(64, PqM, PqK, PqSeed), path)
      path
    }

  /** The persisted-pair fused top-10 (BM25-from-artifact lex top-20 ⊕
    * IVF-PQ dense top-20 under RRF), memoized per (session, dir): the
    * SAME fused list is s33's answer, s34's audited side, and s35's
    * packing input, so the sweep computes it once — the materialized
    * view a serving deployment would keep hot. */
  private def sharedHybridFused(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.Memo.df(s, s"hybrid-fused|$dir") {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val lex = Retrieval.bm25TopKFromIndex(s, sharedBm25Path(s, dir),
          bm25Queries(docs), "query_id", "qtext", k = 20)
        .select("query_id", "doc_id", "rank")
      Retrieval.rrfFuse(lex, hybridDenseServe(s, dir, sharedIvfPqPath(s, dir)),
        k = 10)
    }

  /** Oracle for the persisted hybrid pair: bm25 CTEs (prefix `lq`) +
    * s18's probe/ADC CTEs (candidates restricted to documents ids,
    * queries the common %125==7 set) + the RRF fold. `fused = true`
    * emits the fused top-10 (s33); `fused = false` additionally
    * replays the EXACT-dense fusion and emits the per-query top-10
    * rank overlap between the two (s34). [[ragPackOracle]] chains the
    * same CTEs into the budgeted context walk (s35). */
  private def hybridSharedCtes: String =
    s"""${bm25Ctes(qn = "lq")},
         |${ivfPqCtes(64, IvfLists, IvfProbes, 7L,
             candWhere = "a.vec_id IN (SELECT doc_id FROM documents)",
             queryWhere =
               "vec_id % 125 = 7 AND vec_id IN (SELECT doc_id FROM documents)")},
         |lex AS (SELECT query_id, doc_id, rank FROM lqrk WHERE rank <= 20),
         |den AS (SELECT query_id, neighbor_id AS doc_id, rank FROM ranked
         |  WHERE rank <= 20),
         |f AS (SELECT coalesce(l.query_id, d.query_id) AS query_id,
         |    coalesce(l.doc_id, d.doc_id) AS doc_id,
         |    round(coalesce(1.0 / (60 + l.rank), 0) +
         |          coalesce(1.0 / (60 + d.rank), 0), 6) AS rrf
         |  FROM lex l FULL OUTER JOIN den d
         |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
         |frk AS (SELECT query_id, doc_id, rrf, row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM f)""".stripMargin

  private def hybridPersistedOracle(fused: Boolean): String = {
    val shared = hybridSharedCtes
    if (fused)
      s"""WITH $shared
         |SELECT query_id, doc_id, rrf, rank FROM frk WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    else
      s"""WITH $shared,
         |ce AS (SELECT * FROM e WHERE vec_id IN (SELECT doc_id FROM documents)),
         |edsc AS (SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
         |    round(${dotSql("a.v", "b.v")} /
         |      (sqrt(${dotSql("a.v", "a.v")}) * sqrt(${dotSql("b.v", "b.v")})), 6) AS cos
         |  FROM ce a JOIN ce b ON a.vec_id % 125 = 7 AND a.vec_id <> b.vec_id),
         |edrk AS (SELECT query_id, doc_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rank FROM edsc),
         |dene AS (SELECT query_id, doc_id, rank FROM edrk WHERE rank <= 20),
         |fe AS (SELECT coalesce(l.query_id, d.query_id) AS query_id,
         |    coalesce(l.doc_id, d.doc_id) AS doc_id,
         |    round(coalesce(1.0 / (60 + l.rank), 0) +
         |          coalesce(1.0 / (60 + d.rank), 0), 6) AS rrf
         |  FROM lex l FULL OUTER JOIN dene d
         |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
         |ferk AS (SELECT query_id, doc_id, rrf, row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fe),
         |ov AS (SELECT a.query_id, count(*) AS n_overlap
         |  FROM frk a JOIN ferk b
         |    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
         |  WHERE a.rank <= 10 AND b.rank <= 10 GROUP BY 1),
         |qs AS (SELECT DISTINCT vec_id AS query_id FROM ce WHERE vec_id % 125 = 7)
         |SELECT qs.query_id, CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  round(coalesce(ov.n_overlap, 0) / 10.0, 2) AS overlap_frac
         |FROM qs LEFT JOIN ov USING (query_id) ORDER BY qs.query_id""".stripMargin
  }

  /** s35 oracle: the persisted-hybrid CTEs + the budgeted context
    * walk — fused docs join their doclens, a per-query running token
    * sum in rank order, keep while cum ≤ budget (greedy prefix). */
  private def ragPackOracle(budget: Int): String =
    s"""WITH $hybridSharedCtes
       |SELECT query_id, doc_id, CAST(rank AS INT) AS rank,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM (
       |  SELECT f.query_id, f.doc_id, f.rank, dl.dl AS n_tokens,
       |    sum(dl.dl) OVER (PARTITION BY f.query_id ORDER BY f.rank) AS cum_tokens
       |  FROM frk f JOIN dl ON f.doc_id = dl.doc_id WHERE f.rank <= 10)
       |WHERE cum_tokens <= $budget
       |ORDER BY query_id, rank""".stripMargin

  private[queries] def bm25IndexOracle(corpusFilter: String = "",
      phases: Int = 1): String = {
    val base = bm25Ctes(corpusFilter)
    if (phases == 1)
      s"""WITH $base
         |SELECT query_id, doc_id, score, rank FROM qrk WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    else {
      val tags = (1 to phases)
        .map(p => s"SELECT $p AS phase").mkString(" UNION ALL ")
      s"""WITH $base
         |SELECT ph.phase, query_id, doc_id, score, rank
         |FROM qrk CROSS JOIN ($tags) ph WHERE rank <= 10
         |ORDER BY ph.phase, query_id, rank""".stripMargin
    }
  }

  /** Shared MinHash signature table of documents ∪ planted copies —
    * session-lifetime Memo (not per-call Caches): d08 and d12 run the
    * SAME signature build (same input, same n/numHashes), and the
    * bench sweep's per-query Caches.clear was forcing each to rebuild
    * the shingle explosion from scratch (~5 s of the two queries'
    * sweep cost was one redundant build). Bounded: one numHashes-col
    * row per document — sf-sized, the same class as the memoized base
    * tables. */
  private def plantedMinhashSig(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.Memo.df(s, s"mh-sig-planted|$dir|3|$MhHashes") {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
      Dedup.minhashSignaturesPortable(docs.unionByName(planted),
        "doc_id", "text", n = 3, numHashes = MhHashes)
    }

  val all: Seq[NamedQuery] = Seq(

    // ---- exact dedup: content-hash groups, canonical keep-id.
    NamedQuery("d01_dedup_exact",
      (s, dir) => Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("text_hash"),
      Some("""SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_id
             |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin)),

    // ---- exact 3-gram Jaccard near-dup pairs over a df-capped
    // inverted shingle index (maxDf=100, jaccard >= 0.05).
    NamedQuery("d02_ngram_jaccard_pairs",
      (s, dir) => Dedup.ngramJaccardPairs(Tables.documents(s, dir),
          "doc_id", "text", n = 3, minJaccard = 0.05, maxDf = 100)
        .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS ts
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    generate_series(1, len(ts) - 2), i -> array_to_string(ts[i:i+2], ' '))) AS shs
             |  FROM toks WHERE len(ts) >= 3),
             |ex AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
             |rare AS (SELECT ex.doc_id, ex.sh FROM ex
             |         JOIN (SELECT sh, count(*) AS df FROM ex GROUP BY sh) d ON ex.sh = d.sh
             |         WHERE d.df <= 100),
             |sizes AS (SELECT doc_id, count(*) AS sz FROM rare GROUP BY doc_id),
             |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
             |          FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2)
             |SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
             |       round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
             |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
             |WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.05
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- exact n-gram CONTAINMENT pairs (d02's asymmetric sibling):
    // planted QUOTES — each %10==4 doc truncated to its first 15
    // tokens, id +1000000 — sit wholly inside their originals, so the
    // short side's containment reads ~1.0 where Jaccard reads near
    // zero (union dominated by the long side). Every planted quote
    // must surface from the directed score.
    NamedQuery("d30_ngram_containment_pairs",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val quotes = docs.filter(col("doc_id") % 10 === 4)
          .select((col("doc_id") + 1000000).as("doc_id"),
            array_join(slice(TextOps.tokens(col("text")), 1, 15), " ")
              .as("text"))
        Dedup.ngramContainmentPairs(docs.unionByName(quotes),
            "doc_id", "text", n = 3, minContain = 0.9, maxDf = 100)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS ts
             |  FROM documents),
             |alltoks AS (
             |  SELECT doc_id, ts FROM toks0
             |  UNION ALL
             |  SELECT doc_id + 1000000, ts[1:15] FROM toks0 WHERE doc_id % 10 = 4),
             |sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    generate_series(1, len(ts) - 2), i -> array_to_string(ts[i:i+2], ' '))) AS shs
             |  FROM alltoks WHERE len(ts) >= 3),
             |ex AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
             |rare AS (SELECT ex.doc_id, ex.sh FROM ex
             |         JOIN (SELECT sh, count(*) AS df FROM ex GROUP BY sh) d ON ex.sh = d.sh
             |         WHERE d.df <= 100),
             |sizes AS (SELECT doc_id, count(*) AS sz FROM rare GROUP BY doc_id),
             |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
             |          FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2)
             |SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
             |       round(inter / sa.sz, 6) AS contain_ab,
             |       round(inter / sb.sz, 6) AS contain_ba
             |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
             |WHERE round(inter / sa.sz, 6) >= 0.9 OR round(inter / sb.sz, 6) >= 0.9
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- MinHash+LSH on documents ∪ planted copies: every planted
    // duplicate must surface as a candidate pair with est_jaccard 1.0.
    // xxhash64 signatures aren't SQL-expressible → rows-only check.
    NamedQuery("d03_minhash_lsh_pairs", (s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
      Dedup.minhashLshPairs(docs.unionByName(planted), "doc_id", "text",
          n = 3, numHashes = 32, bands = 8, minJaccard = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // ---- engine-portable MinHash+LSH (md5 hash family): the SAME
    // band→bucket→verify pipeline as d03, but fully oracle-checked —
    // planted duplicates must surface with est_jaccard 1.0.
    NamedQuery("d08_minhash_portable_pairs",
      (s, dir) => Dedup.minhashLshPairsFromSig(plantedMinhashSig(s, dir),
          numHashes = MhHashes, bands = MhBands, minJaccard = 0.5)
        .orderBy("id_a", "id_b"),
      Some(minhashPortableOracle(MhHashes, MhBands, 0.5))),

    // ---- SimHash sketches (deterministic 64-bit near-dup sketch).
    NamedQuery("d04_simhash_sketches",
      (s, dir) => Dedup.simhash(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("id")),

    // ---- SimHash near-dup pairs over planted copies (hamming = 0).
    NamedQuery("d05_simhash_pairs", (s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
      Dedup.simhashPairs(docs.unionByName(planted), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // ---- near-dup KEEP (cluster collapse): banded-MinHash pairs →
    // min-label connected components → min-id survivor per near-dup
    // cluster. The whole composition is oracle-checked end to end
    // (pair CTEs + unrolled component steps).
    NamedQuery("d12_neardup_kept_docs",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
        Dedup.dropNearDupsPortable(docs.unionByName(planted), "doc_id", "text",
            n = 3, numHashes = MhHashes, bands = MhBands, minJaccard = 0.5,
            iters = 4, sig = Some(plantedMinhashSig(s, dir)))
          .select("doc_id").orderBy("doc_id")
      },
      Some(neardupKeepOracle(MhHashes, MhBands, 0.5, iters = 4))),

    // ---- near-dup KEEP-BEST: like d12, but the survivor of each
    // cluster is the MOST-COMPLETE member (max token count, ties →
    // min id), exercised against 80%-truncated mirror copies — the
    // production rule (keep the best version) where d12 keeps the
    // canonical id. Whole composition oracle-checked end to end.
    NamedQuery("d19_neardup_best_kept",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val planted = docs.select((col("doc_id") + 1000000).as("doc_id"),
          expr("substring(text, 1, CAST(floor(length(text) * 0.8) AS INT))")
            .as("text"))
        val all = docs.unionByName(planted)
          .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
        Dedup.dropNearDupsKeepBest(all, "doc_id", "text", "n_tokens",
            n = 3, numHashes = MhHashes, bands = MhBands, minJaccard = 0.5,
            iters = 4)
          .select("doc_id").orderBy("doc_id")
      },
      Some(neardupBestKeptOracle(MhHashes, MhBands, 0.5, iters = 4))),

    // ---- portable SimHash sketches (md5-nibble bit family): the
    // oracle-checked twin of d04 — same tf-weighted sign-bit sketch,
    // emitted as four nonnegative 16-bit band longs.
    NamedQuery("d10_simhash_portable_sketches",
      (s, dir) => Dedup.simhashPortable(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("id"),
      Some(s"""WITH docs AS (SELECT doc_id AS id, text FROM documents),
             |${simhashCtes("docs")}
             |SELECT id, band0, band1, band2, band3 FROM sk ORDER BY id""".stripMargin)),

    // ---- portable SimHash banded pairs over planted copies: the
    // oracle-checked twin of d05 (planted dups surface at hamming 0).
    NamedQuery("d11_simhash_portable_pairs",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
        Dedup.simhashPairsPortable(docs.unionByName(planted), "doc_id", "text",
            maxHamming = 3)
          .orderBy("id_a", "id_b")
      },
      Some(simhashPortablePairsOracle(maxHamming = 3))),

    // ---- PERSISTED SimHash index admission (d35): the sketch-index
    // lifecycle for the SimHash family (exact-hash d26, MinHash d27,
    // gram d31 each have theirs) — the corpus slice doc_id%3≠0 builds
    // the index once, then the FULL corpus re-ingests against it:
    // indexed docs self-match at hamming 0 and are rejected, fresh
    // docs are rejected only when a banded candidate verifies at
    // hamming ≤ 3. Band-keyed join, never all-pairs; the oracle
    // replays sketch → band join → hamming verify → anti-join.
    NamedQuery("d35_simhash_index_admission",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("simhash_index")
        graft.Fs.deleteRecursive(s, path)
        Dedup.writeSimhashIndex(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", path)
        Dedup.simhashAdmit(s, path, docs, "doc_id", "text", maxHamming = 3)
          .select("doc_id").orderBy("doc_id")
      },
      Some(simhashAdmitOracle(maxHamming = 3))),

    // ---- exact-dedup KEEP operator over planted copies: the survivors
    // must be exactly the minimum-id row per distinct text.
    NamedQuery("d07_dedup_kept_docs",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
        Dedup.dropExactDups(docs.unionByName(planted), "doc_id", "text")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
             |SELECT doc_id FROM (
             |  SELECT doc_id, row_number() OVER (
             |    PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM all_docs) WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),

    // ---- embedding cosine near-dup pairs — hyperplane-LSH banded
    // candidates + exact-cosine verify (the 100 TB path: shuffle is
    // O(rows × bands), never all-pairs). Fully oracle-checked: the
    // generator inlines the SAME seeded planes, so signatures, buckets,
    // candidates, and exact cosines match bit-for-bit. The brute-force
    // all-pairs form is the SimilaritySpec cross-check only.
    NamedQuery("d06_embedding_neardup",
      (s, dir) => Similarity.cosineNearDupPairsLsh(
          Tables.embeddings(s, dir).select("vec_id", "embedding"), minCos = 0.4,
          dim = 64, nBits = NdBits, bands = NdBands, seed = 42L)
        .orderBy("id_a", "id_b"),
      // 60 bits (not 64): bit 63 would need 1<<63, which DuckDB's
      // BIGINT shift rejects; 15 bands of 4 keeps ~93% recall at
      // cos 0.4 with every signature nonnegative on both engines.
      Some(neardupLshOracle(dim = 64, nBits = NdBits, bands = NdBands,
        minCos = 0.4, seed = 42L))),

    // ---- embedding near-dup KEEP: LSH pairs → component collapse →
    // min-id survivors; composed oracle (d06 CTEs + unrolled steps).
    NamedQuery("d13_embedding_neardup_kept",
      (s, dir) => Similarity.dropNearDupEmbeddingsLsh(
          Tables.embeddings(s, dir).select("vec_id", "embedding"), minCos = 0.4,
          dim = 64, nBits = NdBits, bands = NdBands, seed = 42L, iters = 4)
        .select(col("id").as("vec_id")).orderBy("vec_id"),
      Some(neardupEmbKeepOracle(dim = 64, nBits = NdBits, bands = NdBands,
        minCos = 0.4, seed = 42L, iters = 4))),

    // ---- SEMANTIC decontamination (embedding-level): corpus vectors
    // (vec_id%10≠0) cosine-close (≥0.4) to ANY held-out benchmark
    // vector (vec_id%10=0) are dropped — catches the paraphrased eval
    // leakage n-gram decontamination (d14/d15) can't see. Cross-set
    // banded join (the d16 shape): benchmark signatures + vectors
    // broadcast; exact cosine verifies every flag. Oracle replays the
    // seeded planes, signatures, buckets, and cosines bit-for-bit.
    NamedQuery("d18_semantic_decontam_kept",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        Similarity.semanticDecontaminate(
            e.filter(col("vec_id") % 10 =!= 0),
            e.filter(col("vec_id") % 10 === 0),
            "vec_id", "embedding", minCos = 0.4, dim = 64,
            nBits = NdBits, bands = NdBands, seed = 42L)
          .select("vec_id").orderBy("vec_id")
      },
      Some(semanticDecontamOracle(dim = 64, nBits = NdBits, bands = NdBands,
        minCos = 0.4, seed = 42L))),

    // ---- SemDeDup-style CLUSTER-PARTITIONED embedding dedup: the
    // OTHER standard candidate-pruning geometry next to d13's LSH
    // bands — assign to nearest fixed centroid (the s04 cells), drop
    // rows with a lower-id in-cell neighbor at cosine ≥ 0.4. At 100 TB
    // nlist grows with the corpus to hold Σ|cell|² bounded (the paper
    // runs 50k clusters). Centroids inlined into the oracle, so cells,
    // cosines, and the survivor set replay bit-for-bit.
    NamedQuery("d25_semdedup_kept",
      (s, dir) => Similarity.semDedupKept(
          Tables.embeddings(s, dir).select("vec_id", "embedding"),
          minCos = 0.4, dim = 64, nlist = IvfLists, seed = 7L)
        .select(col("id"), col("cluster")).orderBy("id"),
      Some(semDedupOracle(dim = 64, nlist = IvfLists, minCos = 0.4,
        seed = 7L))),

    // ---- benchmark decontamination REPORT: corpus docs (doc_id%10≠0)
    // sharing any 4-gram with the held-out benchmark slice (doc_id%10=0),
    // counted per source. Benchmark n-gram set is broadcast — the
    // corpus side never shuffles (PlanSpec pins the broadcast).
    NamedQuery("d14_decontam_report",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        val benchmark = docs.filter(col("doc_id") % 10 === 0)
        val flagged = Dedup.contaminatedIds(corpus, benchmark, "doc_id", "text", n = DecontamN)
          .select(col("id").as("doc_id"), lit(1L).as("contam"))
        corpus.select("doc_id", "source").join(flagged, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("contam"), lit(0L))).as("n_contaminated"))
          .orderBy("source")
      },
      Some(s"""WITH ${decontamCtes(DecontamN)}
             |SELECT d.source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN f.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             |    AS n_contaminated
             |FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
             |WHERE d.doc_id % 10 != 0
             |GROUP BY 1 ORDER BY source""".stripMargin)),

    // ---- benchmark decontamination KEEP: the corpus minus every
    // flagged doc — the form a training-data export actually runs.
    NamedQuery("d15_decontam_kept",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.decontaminate(docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = DecontamN)
          .select("doc_id", "source").orderBy("doc_id")
      },
      Some(s"""WITH ${decontamCtes(DecontamN)}
             |SELECT doc_id, source FROM documents d
             |WHERE d.doc_id % 10 != 0
             |  AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = d.doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- decontamination served from the PERSISTED gram index (d31):
    // d15's semantics with the benchmark gram set written once
    // (gram-prefix-partitioned parquet) and RELOADED at serve —
    // benchmark text never rescanned. Same oracle as d15: passing it
    // IS the round-trip proof (the s16 pattern applied to the
    // decontamination gate, completing the persisted-gate family).
    NamedQuery("d31_decontam_persisted",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val path = graft.ScratchDirs.scratch("gram_idx")
        Dedup.writeGramIndex(docs.filter(col("doc_id") % 10 === 0),
          "text", n = DecontamN, path)
        Dedup.decontaminateAgainstGramIndex(
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
            n = DecontamN, path)
          .select("doc_id", "source").orderBy("doc_id")
      },
      Some(s"""WITH ${decontamCtes(DecontamN)}
             |SELECT doc_id, source FROM documents d
             |WHERE d.doc_id % 10 != 0
             |  AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = d.doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- GRADED decontamination: per-doc n-gram overlap FRACTION vs
    // the benchmark slice — the thresholded form (≥50% of a doc's
    // distinct 4-grams in the eval set → contaminated) that replaces
    // d14's over-flagging any-single-gram rule on long documents. The
    // flag is integer math (2·n_hit ≥ n_grams); the fraction is
    // reporting-only, rounded 4dp on both engines.
    NamedQuery("d22_contam_overlap",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.contaminationOverlap(docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
            n = DecontamN)
          .orderBy("id")
      },
      Some(s"""WITH ${decontamCtes(DecontamN)}
             |SELECT exd.doc_id AS id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN b.ng IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             |    AS n_hit,
             |  round(CAST(sum(CASE WHEN b.ng IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
             |    / count(*), 4) AS overlap_frac,
             |  CAST(CASE WHEN 2 * sum(CASE WHEN b.ng IS NULL THEN 0 ELSE 1 END)
             |    >= count(*) THEN 1 ELSE 0 END AS BIGINT) AS contaminated
             |FROM exd LEFT JOIN bench b USING (ng)
             |WHERE exd.doc_id % 10 != 0
             |GROUP BY exd.doc_id ORDER BY id""".stripMargin)),

    // ---- substring-level exact dedup: maximal repeated-substring
    // spans from duplicated k-gram runs (suffix-array-style hygiene,
    // catches unaligned repeats chunk dedup misses). Pure integer
    // output (0-based token positions) — deterministic at any sf.
    NamedQuery("d23_repeated_substrings",
      (s, dir) => Dedup.repeatedSubstringSpans(Tables.documents(s, dir),
          "doc_id", "text", k = 8)
        .orderBy("id", "start_tok"),
      Some("""WITH t AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts FROM documents),
             |ex AS (SELECT doc_id AS id, i - 1 AS pos,
             |    array_to_string(ts[i : i + 7], ' ') AS gram
             |  FROM t, unnest(generate_series(1, len(ts) - 7)) AS u(i)
             |  WHERE len(ts) >= 8),
             |dup AS (SELECT gram FROM ex GROUP BY gram HAVING count(*) > 1),
             |m AS (SELECT id, pos,
             |    row_number() OVER (PARTITION BY id ORDER BY pos) AS rn
             |  FROM ex WHERE gram IN (SELECT gram FROM dup)),
             |sp AS (SELECT id, min(pos) AS s, max(pos) + 7 AS e
             |  FROM (SELECT id, pos, pos - rn AS isl FROM m)
             |  GROUP BY id, isl)
             |SELECT id, CAST(s AS BIGINT) AS start_tok,
             |  CAST(e AS BIGINT) AS end_tok,
             |  CAST(e - s + 1 AS BIGINT) AS span_tokens
             |FROM sp ORDER BY id, start_tok""".stripMargin)),

    // ---- span-cut emission: the pass that CONSUMES d23's spans —
    // keep the canonical first occurrence of each repeated span
    // content, cut the rest, re-emit cleaned token text. The oracle
    // reassembles strings from kept token ranges the naive way
    // (explode every position); the Spark path must agree exactly.
    NamedQuery("d24_span_cut_emission",
      (s, dir) => Dedup.spanCutEmit(Tables.documents(s, dir),
          "doc_id", "text", k = 8)
        .orderBy("id"),
      Some("""WITH t AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts FROM documents),
             |ex AS (SELECT doc_id AS id, i - 1 AS pos,
             |    array_to_string(ts[i : i + 7], ' ') AS gram
             |  FROM t, unnest(generate_series(1, len(ts) - 7)) AS u(i)
             |  WHERE len(ts) >= 8),
             |dup AS (SELECT gram FROM ex GROUP BY gram HAVING count(*) > 1),
             |m AS (SELECT id, pos,
             |    row_number() OVER (PARTITION BY id ORDER BY pos) AS rn
             |  FROM ex WHERE gram IN (SELECT gram FROM dup)),
             |sp AS (SELECT id, min(pos) AS s, max(pos) + 7 AS e
             |  FROM (SELECT id, pos, pos - rn AS isl FROM m)
             |  GROUP BY id, isl),
             |spc AS (SELECT sp.id, sp.s, sp.e,
             |    array_to_string(t.ts[sp.s + 1 : sp.e + 1], ' ') AS content
             |  FROM sp JOIN t ON t.doc_id = sp.id),
             |rk AS (SELECT id, s, e,
             |    row_number() OVER (PARTITION BY content ORDER BY id, s) AS rn
             |  FROM spc),
             |cutp AS (SELECT DISTINCT id, u.p AS pos
             |  FROM rk, unnest(generate_series(s, e)) AS u(p) WHERE rn > 1),
             |keepp AS (SELECT DISTINCT id, u.p AS pos
             |  FROM rk, unnest(generate_series(s, e)) AS u(p) WHERE rn = 1),
             |realcut AS (SELECT id, pos FROM cutp
             |  ANTI JOIN keepp USING (id, pos)),
             |tok AS (SELECT doc_id AS id, i - 1 AS pos, ts[i] AS tok
             |  FROM t, unnest(generate_series(1, len(ts))) AS u(i)),
             |kept AS (SELECT id, pos, tok FROM tok
             |  ANTI JOIN realcut USING (id, pos)),
             |outp AS (SELECT id, string_agg(tok, ' ' ORDER BY pos) AS ct,
             |    count(*) AS nk FROM kept GROUP BY id),
             |rem AS (SELECT id, count(*) AS nr FROM realcut GROUP BY id)
             |SELECT d.doc_id AS id,
             |  coalesce(outp.ct, '') AS cleaned_text,
             |  CAST(coalesce(outp.nk, 0) AS BIGINT) AS n_tokens_kept,
             |  CAST(coalesce(rem.nr, 0) AS BIGINT) AS n_tokens_removed
             |FROM documents d
             |LEFT JOIN outp ON outp.id = d.doc_id
             |LEFT JOIN rem ON rem.id = d.doc_id
             |ORDER BY id""".stripMargin)),

    // ---- incremental-ingest near-dup: a NEW batch (planted replays of
    // every 7th doc) joined against the EXISTING corpus on band
    // hashes — the production dedup shape (batch × index, never
    // corpus × corpus). Planted replays must surface at est 1.0.
    NamedQuery("d16_incremental_neardup",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val newBatch = docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
        Dedup.minhashLshJoinPortable(newBatch, docs, "doc_id", "text",
            n = 3, numHashes = MhHashes, bands = MhBands, minJaccard = 0.5)
          .orderBy("new_id", "corpus_id")
      },
      Some(minhashIncrementalOracle(MhHashes, MhBands, 0.5))),

    // ---- incremental EXACT dedup against a PERSISTED hash index (the
    // s16 pattern for d01's semantics): build the (text_hash,
    // first_id) index from the even half, ingest the odd half —
    // within-batch min-id dedup, hash anti-join against the reloaded
    // index (indexed text never rescanned), append admitted hashes.
    // The oracle replays both gates: admitted ⟺ first odd holder of a
    // hash no even doc holds.
    NamedQuery("d26_incremental_exact_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("hash_idx")
        Dedup.writeHashIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", path)
        // the corpus has no organic exact dups, so the batch PLANTS
        // both rejection cases (the sw02/d16 convention): replays of
        // indexed even docs (cross-batch gate) and replays of batch
        // odd docs (within-batch gate — the lower original id wins)
        val batch = docs.filter(col("doc_id") % 2 =!= 0)
          .unionByName(docs.filter(col("doc_id") % 10 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000))
          .unionByName(docs.filter(col("doc_id") % 10 === 1)
            .withColumn("doc_id", col("doc_id") + 2000000))
        Dedup.ingestAgainstHashIndex(batch, "doc_id", "text", path)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH idx AS (SELECT DISTINCT md5(text) AS h FROM documents
             |  WHERE doc_id % 2 = 0),
             |batch AS (
             |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1
             |  UNION ALL
             |  SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id + 2000000, md5(text) FROM documents WHERE doc_id % 10 = 1),
             |win AS (SELECT doc_id, h, row_number() OVER (
             |    PARTITION BY h ORDER BY doc_id) AS rn FROM batch)
             |SELECT doc_id FROM win
             |WHERE rn = 1 AND h NOT IN (SELECT h FROM idx)
             |ORDER BY doc_id""".stripMargin)),

    // ---- incremental NEAR-dup dedup against a PERSISTED MinHash band
    // index (d26's LSH sibling — the production near-dup loop): the
    // even half's signatures + band rows persist as the index; the
    // batch (odd half + planted replays of indexed docs at +1000000
    // and of batch docs at +2000000) dedups within itself by the
    // lower-id-neighbor rule, probes the index bands, and appends its
    // admitted signatures. Both gates must fire; indexed text is never
    // rescanned. The oracle replays signatures, bands, both gates.
    NamedQuery("d27_incremental_neardup_index",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("mh_idx")
        Dedup.writeMinhashIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", n = 3, numHashes = MhHashes, bands = MhBands, path)
        val batch = docs.filter(col("doc_id") % 2 =!= 0)
          .unionByName(docs.filter(col("doc_id") % 10 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000))
          .unionByName(docs.filter(col("doc_id") % 10 === 1)
            .withColumn("doc_id", col("doc_id") + 2000000))
        Dedup.ingestAgainstMinhashIndex(batch, "doc_id", "text", path,
            n = 3, numHashes = MhHashes, bands = MhBands, minJaccard = 0.5)
          .select("doc_id").orderBy("doc_id")
      },
      Some(minhashIndexIngestOracle(MhHashes, MhBands, 0.5))),

    // ---- BLOOM-gated exact-dedup ingest (d26 with the join input
    // culled by the persisted constant-size filter — the 100 TB
    // admission shape): TWO sequential batches through the gate. The
    // two-phase design makes the ORACLE pin the filter MAINTENANCE:
    // batch 2 replays batch-1 admissions, and those replays are only
    // rejected if the merged filter routes them into the verification
    // join — a broken merge would admit them scan-stage (no join ever
    // sees them), which the oracle's `a1` gate would catch. Both d26
    // gates (cross-batch vs index, within-batch min-id) fire in each
    // phase via the planted replays.
    NamedQuery("d29_bloom_gated_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("bloom_idx")
        Dedup.writeHashIndex(docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", path)
        Dedup.writeBloomIndex(s, path, fpp = 0.01)
        val batch1 = docs.filter(col("doc_id") % 3 === 1)
          .unionByName(docs.filter(col("doc_id") % 9 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000))
        val a1 = Dedup.bloomGatedIngest(batch1, "doc_id", "text", path)
          .select(lit(1).as("phase"), col("doc_id"))
        val batch2 = docs.filter(col("doc_id") % 3 === 2)
          .unionByName(docs.filter(col("doc_id") % 9 === 1)
            .withColumn("doc_id", col("doc_id") + 2000000))
          .unionByName(docs.filter(col("doc_id") % 9 === 3)
            .withColumn("doc_id", col("doc_id") + 3000000))
        val a2 = Dedup.bloomGatedIngest(batch2, "doc_id", "text", path)
          .select(lit(2).as("phase"), col("doc_id"))
        a1.unionByName(a2).orderBy("phase", "doc_id")
      },
      Some("""WITH idx AS (SELECT DISTINCT md5(text) AS h FROM documents
             |  WHERE doc_id % 3 = 0),
             |b1 AS (
             |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 1
             |  UNION ALL
             |  SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id % 9 = 0),
             |w1 AS (SELECT doc_id, h, row_number() OVER (
             |    PARTITION BY h ORDER BY doc_id) AS rn FROM b1),
             |a1 AS (SELECT doc_id, h FROM w1
             |  WHERE rn = 1 AND h NOT IN (SELECT h FROM idx)),
             |b2 AS (
             |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 2
             |  UNION ALL
             |  SELECT doc_id + 2000000, md5(text) FROM documents WHERE doc_id % 9 = 1
             |  UNION ALL
             |  SELECT doc_id + 3000000, md5(text) FROM documents WHERE doc_id % 9 = 3),
             |w2 AS (SELECT doc_id, h, row_number() OVER (
             |    PARTITION BY h ORDER BY doc_id) AS rn FROM b2),
             |a2 AS (SELECT doc_id, h FROM w2
             |  WHERE rn = 1 AND h NOT IN (SELECT h FROM idx)
             |    AND h NOT IN (SELECT h FROM a1))
             |SELECT 1 AS phase, doc_id FROM a1
             |UNION ALL SELECT 2 AS phase, doc_id FROM a2
             |ORDER BY phase, doc_id""".stripMargin)),

    // ---- brute-force exact ANN: top-5 cosine neighbors for the first
    // 20 vectors against the whole corpus.
    NamedQuery("s01_ann_brute_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb, k = 5)
        .orderBy("query_id", "rank")
    },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |scored AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    round(
             |      list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i])) /
             |      (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i]))) *
             |       sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))),
             |      6) AS cos
             |  FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, cos, row_number() OVER (
             |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- LSH ANN (random hyperplanes): approximate top-5 — the scale
    // path. Fully oracle-checked: the generator inlines the SAME seeded
    // hyperplanes as double literals, and both engines compute the
    // identical sequential double-precision dot, so signature bits —
    // and therefore buckets, candidates, and ranks — match exactly.
    NamedQuery("s02_ann_lsh_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      Similarity.lshCosineTopK(emb.filter(col("vec_id") < 20), emb, k = 5,
          dim = 64, nBits = 32, bands = 8, seed = 42L)
        .orderBy("query_id", "rank")
    },
      Some(lshAnnOracle(dim = 64, nBits = 32, bands = 8, k = 5, seed = 42L))),

    // ---- exact Euclidean top-k: the oracle-checkable exact twin of
    // m06's BRP-LSH (same metric, same key-vector-vs-corpus shape).
    // Both engines evaluate the identical norm-expansion identity in
    // the same fold order, so rounded distances hash-match.
    NamedQuery("s03_ann_euclidean_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      Similarity.euclideanTopK(emb.filter(col("vec_id") < 20), emb, k = 5)
        .orderBy("query_id", "rank")
    },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |n AS (SELECT vec_id,
             |    list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i])) AS nn
             |  FROM e),
             |scored AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    round(sqrt(greatest(nq.nn - 2 *
             |      list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
             |      + nc.nn, 0.0)), 6) AS dist
             |  FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
             |  JOIN n nq ON q.vec_id = nq.vec_id JOIN n nc ON c.vec_id = nc.vec_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, dist, row_number() OVER (
             |    PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, neighbor_id, dist, rank FROM ranked WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- IVF ANN with fixed seeded centroids: the oracle-checkable
    // twin of m07's KMeans IVF — same invert-assign/probe/rank
    // mechanics, centroids inlined into the oracle as literals (the
    // s02 trick), so assignments, probe sets, and ranks hash-match.
    NamedQuery("s04_ann_ivf_fixed", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      Similarity.ivfFixedTopK(emb.filter(col("vec_id") < 20), emb, k = 5,
          dim = 64, nlist = IvfLists, nprobe = IvfProbes, seed = 7L)
        .orderBy("query_id", "rank")
    },
      Some(ivfFixedOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        k = 5, seed = 7L))),

    // ---- metadata-FILTERED vector search (the vector-DB "filtered
    // search" shape): top-5 among corpus rows with label % 3 = 0,
    // served from the SHARED unfiltered s04 index — the predicate is
    // applied to the probed lists' assignment rows BEFORE scoring
    // (Catalyst pushes it below the probe join), so one index build
    // serves every predicate and the serve scan still reads only
    // nprobe/nlist of the corpus. Same probe/rank mechanics as s04 →
    // the oracle is s04's chain with a WHERE on the assignment CTE.
    NamedQuery("s23_filtered_ann", (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfFilteredTopK(
          emb.select("vec_id", "embedding").filter(col("vec_id") < 20),
          emb.select("vec_id", "embedding", "label"), k = 5,
          dim = 64, nlist = IvfLists, nprobe = IvfProbes, seed = 7L,
          keep = col("attr") % 3 === 0)
        .orderBy("query_id", "rank")
    },
      Some(ivfFilteredOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        k = 5, seed = 7L, predSql = "l.label % 3 = 0"))),

    // ---- metadata-FILTERED composed IVF-PQ (s26): s23's filtered
    // search on the production compressed index — one unfiltered
    // IVF-PQ build serves the predicate; the filter prunes the coded
    // assignment rows of the probed lists BEFORE ADC scoring. Same
    // probe/ADC replay as s18's oracle with the candidate predicate as
    // an IN-subquery.
    NamedQuery("s26_filtered_ivf_pq", (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqFilteredTopK(
          emb.select("vec_id", "embedding").filter(col("vec_id") < 20),
          emb.select("vec_id", "embedding", "label"), topK = 5,
          dim = 64, nlist = IvfLists, nprobe = IvfProbes, m = 4,
          kCodes = 16, ivfSeed = 7L, pqSeed = 11L,
          keep = col("attr") % 3 === 0)
        .orderBy("query_id", "rank")
    },
      Some(ivfPqFilteredOracle(dim = 64, nlist = IvfLists,
        nprobe = IvfProbes, topK = 5, ivfSeed = 7L,
        predSql = "label % 3 = 0"))),

    // ---- SQ8 asymmetric-distance top-k (s24): the scalar-quantized
    // sibling of s08's PQ-ADC — corpus and queries quantize to int8
    // with per-vector max-abs scales (s06's exact scheme), similarity
    // = the EXACT integer code dot rescaled by scale_q·scale_c, one
    // byte/dim instead of four. Every step is integer arithmetic or a
    // single double product, so scores and ranks replay bit-for-bit.
    NamedQuery("s24_sq8_adc_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      Similarity.sq8AdcTopK(emb.filter(col("vec_id") < 20), emb, k = 5)
        .orderBy("query_id", "rank")
    },
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |s AS (SELECT vec_id, v,
             |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             |  FROM e),
             |q AS (SELECT vec_id, scale,
             |    CASE WHEN scale > 0
             |         THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
             |         ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
             |  FROM s),
             |scored AS (
             |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             |    round((a.scale * b.scale) * CAST(list_sum(
             |      list_transform(generate_series(1, len(a.qv)),
             |        i -> a.qv[i] * b.qv[i])) AS DOUBLE), 6) AS score
             |  FROM q a JOIN q b ON a.vec_id < 20 AND a.vec_id <> b.vec_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, score, row_number() OVER (
             |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- PERSISTED-index IVF round trip: the s04 pipeline with a
    // parquet write/reload of the index (centroids + per-list
    // assignments, partitioned by list) between build and serve. Same
    // DuckDB oracle as s04 — passing it IS the round-trip proof that
    // serving from the persisted artifacts is bit-identical to
    // serving in memory at equal nprobe.
    NamedQuery("s16_ivf_persisted_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val path = graft.ScratchDirs.scratch("ivf_idx")
      graft.ml.VectorSearch.ivfFixedTopKPersisted(
          emb.filter(col("vec_id") < 20), emb, k = 5,
          dim = 64, nlist = IvfLists, nprobe = IvfProbes, seed = 7L, path)
        .orderBy("query_id", "rank")
    },
      Some(ivfFixedOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        k = 5, seed = 7L))),

    // ---- INCREMENTAL index growth: build the persisted index on the
    // even half of the corpus, APPEND the odd half under the frozen
    // centroids (batch-vs-index, the d16 shape — the indexed corpus is
    // never re-touched), serve from the combined artifacts. Fixed-
    // centroid assignment is per-row independent, so incremental
    // build ≡ full build and s04's oracle is again the exact expected
    // output — proving append-grown indexes serve identically.
    NamedQuery("s17_ivf_incremental_append", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val path = graft.ScratchDirs.scratch("ivf_idx_incr")
      val cents = Similarity.hyperplanes(dim = 64, nBits = IvfLists, seed = 7L)
      graft.ml.VectorSearch.writeIvfIndex(
        Similarity.assignFixed(emb.filter(col("vec_id") % 2 === 0), cents),
        "cluster", cents.zipWithIndex.map(_.swap), path)
      graft.ml.VectorSearch.appendToIvfIndex(
        emb.filter(col("vec_id") % 2 =!= 0), path)
      val (loaded, loadedCents) =
        graft.ml.VectorSearch.readIvfIndex(s, path)
      Similarity.ivfServe(emb.filter(col("vec_id") < 20), loaded,
          loadedCents.map(_._2), k = 5, nprobe = IvfProbes)
        .orderBy("query_id", "rank")
    },
      Some(ivfFixedOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        k = 5, seed = 7L))),

    // ---- index REBALANCE under new centroids (s40): the maintenance
    // op between append (s17) and compaction (s29) — ingest drift
    // skews list sizes, so the index is periodically RE-CENTERED:
    // live assignment rows (the index's own stored vectors — the
    // corpus is never rescanned) re-assign under a NEW seeded
    // centroid set and the per-list layout rewrites. Reassignment is
    // per-row independent, so the rebalanced index must serve
    // BIT-IDENTICALLY to a fresh build under the new centroids —
    // the oracle is s04's with the new seed, and a single row
    // misplaced by the rebalance breaks it.
    NamedQuery("s40_ivf_rebalance", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val path = graft.ScratchDirs.scratch("ivf_idx_rebal")
      val cents7 = Similarity.hyperplanes(dim = 64, nBits = IvfLists, seed = 7L)
      graft.ml.VectorSearch.writeIvfIndex(
        Similarity.assignFixed(emb.filter(col("vec_id") % 2 === 0), cents7),
        "cluster", cents7.zipWithIndex.map(_.swap), path)
      graft.ml.VectorSearch.appendToIvfIndex(
        emb.filter(col("vec_id") % 2 =!= 0), path)
      val cents13 = Similarity.hyperplanes(dim = 64, nBits = IvfLists, seed = 13L)
      graft.ml.VectorSearch.rebalanceIvfIndex(s, path, cents13)
      val (loaded, loadedCents) = graft.ml.VectorSearch.readIvfIndex(s, path)
      Similarity.ivfServe(emb.filter(col("vec_id") < 20), loaded,
          loadedCents.map(_._2), k = 5, nprobe = IvfProbes)
        .orderBy("query_id", "rank")
    },
      Some(ivfFixedOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        k = 5, seed = 13L))),

    // ---- COMPOSED IVF-PQ (s18): probe nprobe lists, ADC-score the PQ
    // codes WITHIN those lists — IVF pruning × PQ compression, the
    // production 100 TB ANN serve shape (the scan reads ~nprobe/nlist
    // of the corpus at m ints per candidate, never a float vector).
    // Centroids AND codebooks are seeded literals inlined into the
    // oracle, so assignments, probe sets, ADC distances, and ranks all
    // replay bit-for-bit.
    NamedQuery("s18_ivf_pq_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      Similarity.ivfPqTopK(emb.filter(col("vec_id") < 20), emb, topK = 5,
          dim = 64, nlist = IvfLists, nprobe = IvfProbes, m = PqM,
          kCodes = PqK, ivfSeed = 7L, pqSeed = PqSeed)
        .orderBy("query_id", "rank")
    },
      Some(ivfPqOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        topK = 5, ivfSeed = 7L))),

    // ---- PERSISTED IVF-PQ round trip (s19, the s16 proof pattern):
    // one-scan encode+assign, write codes/centroids/CODEBOOKS (the
    // whole decode rule frozen in the artifact), reload all three,
    // serve via the same ivfPqServe as s18. Same oracle as s18 —
    // passing it IS the proof that the persisted index serves
    // bit-identically to the in-memory build.
    NamedQuery("s19_ivf_pq_persisted", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      graft.ml.VectorSearch.ivfPqTopKPersisted(
          emb.filter(col("vec_id") < 20), emb, topK = 5,
          dim = 64, nlist = IvfLists, nprobe = IvfProbes, m = PqM,
          kCodes = PqK, ivfSeed = 7L, pqSeed = PqSeed,
          graft.ScratchDirs.scratch("ivfpq_idx"))
        .orderBy("query_id", "rank")
    },
      Some(ivfPqOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        topK = 5, ivfSeed = 7L))),

    // ---- INCREMENTAL IVF-PQ index growth (s25 — s17's coded
    // sibling, completing the {IVF, IVF-PQ} × {persist, append}
    // matrix): build the persisted composed index on the even half,
    // APPEND the odd half encoded under the ARTIFACT's own frozen
    // centroids + codebooks (reloaded from disk — the decode rule
    // travels with the index), serve from the combined layout.
    // Per-row encode+assign is input-independent, so incremental
    // build ≡ full build and s18's oracle is the exact expected
    // output.
    NamedQuery("s25_ivf_pq_incremental_append", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val path = graft.ScratchDirs.scratch("ivfpq_idx_incr")
      val cents = Similarity.hyperplanes(dim = 64, nBits = IvfLists, seed = 7L)
      val books = Similarity.pqCodebooks(64, PqM, PqK, PqSeed)
      graft.ml.VectorSearch.writeIvfPqIndex(
        Similarity.ivfPqEncodeAssign(emb.filter(col("vec_id") % 2 === 0),
          cents, 64, PqM, PqK, PqSeed),
        cents.zipWithIndex.map(_.swap), books, path)
      graft.ml.VectorSearch.appendToIvfPqIndex(
        emb.filter(col("vec_id") % 2 =!= 0), path, dim = 64)
      Similarity.ivfPqServe(emb.filter(col("vec_id") < 20),
          s.read.parquet(s"$path/assignments"),
          graft.ml.VectorSearch.readIvfIndexCentroids(s, path).map(_._2),
          graft.ml.VectorSearch.readPqCodebooks(s, path),
          topK = 5, nprobe = IvfProbes, dim = 64, m = PqM)
        .orderBy("query_id", "rank")
    },
      Some(ivfPqOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        topK = 5, ivfSeed = 7L))),

    // ---- IVF-PQ recall audit (s20): recall@5 of the composed index
    // against the EXACT Euclidean top-k (s03's metric — ADC
    // approximates squared Euclidean), per query. The monitoring
    // query a deployment of s19 runs continuously; both sides replay
    // in the oracle, so the recall numbers themselves hash-match.
    // MEASURED FINDING (sf0.01): recall is 0.0 — and so is full-scan
    // ADC's (s08 ∩ s03 = 0/100): 4 bits/subspace of FIXED seeded
    // codebooks carries no ranking signal on 5 000 isotropic
    // Gaussians. That is the corpus's property, not the operator's
    // (the s14 isotropy caveat, one level deeper): real embedding
    // corpora cluster, and production codebooks are TRAINED. The
    // audit exists precisely to surface this before a deployment
    // trusts the index; the mechanics it verifies (probe sets, ADC
    // arithmetic, ranks) hash-match the oracle bit-for-bit.
    NamedQuery("s20_ivf_pq_recall", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val q = emb.filter(col("vec_id") < 20)
      Similarity.recallAudit(
          Similarity.euclideanTopK(q, emb, k = 5),
          Similarity.ivfPqTopK(q, emb, topK = 5,
            dim = 64, nlist = IvfLists, nprobe = IvfProbes, m = PqM,
            kCodes = PqK, ivfSeed = 7L, pqSeed = PqSeed),
          k = 5)
        .orderBy("query_id")
    },
      Some(s"""WITH ${ivfPqCtes(dim = 64, nlist = IvfLists,
                nprobe = IvfProbes, ivfSeed = 7L)},
             |apx AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
             |bn AS (SELECT vec_id, ${dotSql("v", "v")} AS nn2 FROM e),
             |bscored AS (SELECT eq.vec_id AS query_id, ec.vec_id AS neighbor_id,
             |    round(sqrt(greatest(nq.nn2 - 2 * ${dotSql("eq.v", "ec.v")}
             |      + nc.nn2, 0.0)), 6) AS dist
             |  FROM e eq JOIN e ec ON eq.vec_id < 20 AND eq.vec_id <> ec.vec_id
             |  JOIN bn nq ON eq.vec_id = nq.vec_id
             |  JOIN bn nc ON ec.vec_id = nc.vec_id),
             |bex AS (SELECT query_id, neighbor_id FROM (
             |    SELECT query_id, neighbor_id, row_number() OVER (
             |      PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
             |    FROM bscored) WHERE rank <= 5)
             |SELECT bex.query_id, count(apx.neighbor_id) AS n_hits,
             |  round(count(apx.neighbor_id) / 5.0, 4) AS recall
             |FROM bex LEFT JOIN apx
             |  ON bex.query_id = apx.query_id AND bex.neighbor_id = apx.neighbor_id
             |GROUP BY bex.query_id ORDER BY bex.query_id""".stripMargin)),

    // ---- RESIDUAL IVF-PQ (s22): the FAISS-IVFPQ standard form — PQ
    // codes encode v − centroid(cluster), and each probed list scores
    // the QUERY's residual against that list's centroid. Residual
    // subtraction replayed at REAL precision on both engines (see the
    // oracle builder); assignment, codes, probes, ADC and ranks all
    // hash-match.
    NamedQuery("s22_ivf_pq_residual_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      Similarity.ivfPqResidualTopK(emb.filter(col("vec_id") < 20), emb,
          topK = 5, dim = 64, nlist = IvfLists, nprobe = IvfProbes,
          m = PqM, kCodes = PqK, ivfSeed = 7L, pqSeed = PqSeed)
        .orderBy("query_id", "rank")
    },
      Some(ivfPqResidualOracle(dim = 64, nlist = IvfLists,
        nprobe = IvfProbes, topK = 5, ivfSeed = 7L))),

    // ---- IVF-PQ probe-count recall sweep (s21): recall@5 of the
    // COMPOSED index vs exact Euclidean for nprobe ∈ {1,2,4,8} — the
    // commissioning measurement that picks nprobe for the s19 index.
    // One shared coded build serves every sweep point; both sides
    // replay in the oracle, so the recall numbers hash-match.
    // MEASURED FINDING (sf0.01): flat 0.0 at every probe count —
    // quantization error dominates probe loss entirely on this
    // corpus (see s20's comment); the sweep is the instrument that
    // would catch it at commissioning time.
    NamedQuery("s21_ivf_pq_probe_sweep", (s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      Similarity.ivfPqProbeSweep(emb.filter(col("vec_id") < 20), emb,
          topK = 5, dim = 64, nlist = IvfLists, nprobes = Seq(1, 2, 4, 8),
          m = PqM, kCodes = PqK, ivfSeed = 7L, pqSeed = PqSeed)
        .orderBy("nprobe")
    },
      Some(ivfPqProbeSweepOracle(dim = 64, nlist = IvfLists, topK = 5,
        nprobes = Seq(1, 2, 4, 8), ivfSeed = 7L))),

    // ---- token / char / quality stats per document.
    NamedQuery("t01_text_stats", (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("len_chars"),
        round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextOps.stopwordRatio(col("text"), enStop), 6).as("stopword_ratio"),
        TextOps.qualityScore(col("text"), enStop).as("quality"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
             |  SELECT doc_id, text,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                x -> len(x) > 0) AS toks,
             |    CASE WHEN len(text) = 0 THEN 0.0 ELSE
             |      (len(text) - len(regexp_replace(text, '[.,!?;:''"()\\[\\]{}-]', '', 'g')))::DOUBLE
             |      / len(text) END AS praw
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, text, len(toks) AS n_tokens, praw,
             |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
             |      len(list_filter(toks, x -> list_contains(${sqlList(enStop)}, x)))::DOUBLE
             |      / len(toks) END AS swraw
             |  FROM t)
             |SELECT doc_id, n_tokens, len(text) AS len_chars,
             |  round(praw, 6) AS punct_ratio,
             |  round(swraw, 6) AS stopword_ratio,
             |  round(greatest(least(
             |    least(len(text)::DOUBLE / 500.0, 1.0) * 0.4 +
             |    least(swraw * 5.0, 1.0) * 0.4 +
             |    (1.0 - least(praw * 5.0, 1.0)) * 0.2, 1.0), 0.0), 6) AS quality
             |FROM r ORDER BY doc_id""".stripMargin)),

    // ---- language ID by marker-token voting vs the labeled lang col.
    NamedQuery("t02_lang_id", (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id"),
      Some {
        val scores = TextOps.langMarkers.map { case (lang, words) =>
          s"len(list_intersect(dt, ${sqlList(words)})) AS s_$lang"
        }.mkString(",\n    ")
        val names = TextOps.langMarkers.map(_._1)
        val best = names.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val chain = names.map(l => s"WHEN s_$l = $best THEN '$l'").mkString("\n    ")
        s"""WITH t AS (
           |  SELECT doc_id, lang, list_distinct(list_filter(
           |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS dt
           |  FROM documents),
           |sc AS (SELECT doc_id, lang,
           |    ${scores}
           |  FROM t)
           |SELECT doc_id, lang,
           |  CASE WHEN $best = 0 THEN 'und'
           |    $chain
           |    END AS pred_lang
           |FROM sc ORDER BY doc_id""".stripMargin
      }),

    // ---- mean token length + BPE-ish subword estimate (both HOF
    // folds, both DuckDB-expressible → oracle-backed).
    NamedQuery("t04_token_metrics",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        round(TextOps.meanTokenLen(col("text")), 6).as("mean_token_len"),
        TextOps.approxBpeTokenCount(col("text")).as("approx_bpe_tokens"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS toks
             |  FROM documents)
             |SELECT doc_id,
             |  round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
             |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
             |    END, 6) AS mean_token_len,
             |  CAST(COALESCE(list_sum(list_transform(toks,
             |    x -> ceil(CAST(len(x) AS DOUBLE) / 4.0))), 0) AS BIGINT) AS approx_bpe_tokens
             |FROM t ORDER BY doc_id""".stripMargin)),

    // ---- deterministic content-hash sampling: per-split per-lang
    // counts — reproducible train/val/test assignment, no RNG.
    NamedQuery("p01_hash_split_stats",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("split", Sampling.splitLabel(col("text")))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_id"))
        .orderBy("split", "lang"),
      Some("""WITH b AS (
             |  SELECT doc_id, lang,
             |         CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 10 AS bucket
             |  FROM documents)
             |SELECT CASE WHEN bucket < 7 THEN 'train'
             |            WHEN bucket < 8 THEN 'val' ELSE 'test' END AS split,
             |       lang, count(*) AS n_docs, min(doc_id) AS min_id
             |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin)),

    // ---- weighted upsampling (data-mix construction): each doc
    // repeated (n_chars mod 3)+1 times with a copy counter.
    NamedQuery("p02_weighted_upsample",
      (s, dir) => Sampling.upsample(
          Tables.documents(s, dir)
            .select(col("doc_id"), ((col("n_chars") % 3) + 1).as("weight"))
            .filter(col("doc_id") < 200),
          col("weight"))
        .select("doc_id", "weight", "copy_no")
        .orderBy("doc_id", "copy_no"),
      Some("""WITH w AS (SELECT doc_id, (n_chars % 3) + 1 AS weight
             |           FROM documents WHERE doc_id < 200)
             |SELECT doc_id, weight, u.i AS copy_no
             |FROM w CROSS JOIN LATERAL (
             |  SELECT unnest(generate_series(1, weight)) AS i) u
             |ORDER BY doc_id, copy_no""".stripMargin)),

    // ---- deterministic stratified downsampling (data-mix rebalance):
    // keep 50% of English, 25% of German, all the rest — content-keyed,
    // so the exact surviving set is oracle-checkable.
    NamedQuery("p04_stratified_sample",
      (s, dir) => Sampling.stratifiedSample(
          Tables.documents(s, dir), "lang", col("text"),
          fractions = Map("en" -> 0.5, "de" -> 0.25))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_id"))
        .orderBy("lang"),
      Some("""WITH b AS (
             |  SELECT doc_id, lang,
             |         CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 10000 AS bucket
             |  FROM documents),
             |kept AS (SELECT * FROM b WHERE bucket <
             |  (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 1.0 END) * 10000)
             |SELECT lang, count(*) AS n_docs, min(doc_id) AS min_id
             |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- END-TO-END curation pipeline (quality → langID → filters →
    // exact dedup → split): every stage is portable, so the COMPOSED
    // pipeline is oracle-checked as one flow — the "switch your
    // curation job to this engine" proof.
    NamedQuery("p03_curation_pipeline",
      (s, dir) => graft.text.Curation.curateDocuments(
          Tables.documents(s, dir), "doc_id", "text",
          minQuality = 0.3, keepLangs = Seq("en"))
        .orderBy("id"),
      Some(curationOracle(minQuality = 0.3, keepLangs = Seq("en")))),

    // ---- corpus-statistical quality: mean unigram surprisal under
    // the corpus's own empirical distribution (KenLM-lite scoring).
    NamedQuery("t06_unigram_surprisal",
      (s, dir) => TextOps.unigramSurprisal(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("id"),
      Some("""WITH toks AS (
             |  SELECT doc_id AS id, unnest(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0)) AS tok
             |  FROM documents),
             |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
             |n AS (SELECT count(*) AS n_total FROM toks)
             |SELECT id, round(-avg(ln(cnt::DOUBLE / n_total)), 4) AS surprisal,
             |       count(*) AS n_tokens
             |FROM toks JOIN freq USING (tok) CROSS JOIN n
             |GROUP BY id ORDER BY id""".stripMargin)),

    // ---- deterministic category-keyword extraction: top-5 tokens per
    // source by tf·idf over categories — the corpus-exploration job
    // spark.ml's LDA serves (m04), in a fully oracle-checkable form.
    NamedQuery("t07_category_terms",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
        // cached: nCats, dfc, and the score join all derive from tf
        val tf = graft.Caches.cached(
          toks.groupBy("source", "tok").agg(count(lit(1)).as("tf")))
        val nCats = tf.select(countDistinct("source").as("n_cats"))
        val dfc = tf.groupBy("tok").agg(count(lit(1)).as("cat_df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("score").desc, col("tok"))
        tf.join(broadcast(dfc), "tok").crossJoin(broadcast(nCats))
          .withColumn("score", round(
            col("tf") * log(col("n_cats").cast("double") / col("cat_df")), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("source", "rank", "tok", "score")
          .orderBy("source", "rank")
      },
      Some("""WITH toks AS (
             |  SELECT source, unnest(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0)) AS tok
             |  FROM documents),
             |tf AS (SELECT source, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
             |nc AS (SELECT count(DISTINCT source) AS n_cats FROM tf),
             |dfc AS (SELECT tok, count(*) AS cat_df FROM tf GROUP BY tok),
             |scored AS (
             |  SELECT tf.source, tf.tok,
             |    round(tf.tf * ln(nc.n_cats::DOUBLE / dfc.cat_df), 4) AS score
             |  FROM tf JOIN dfc ON tf.tok = dfc.tok CROSS JOIN nc),
             |ranked AS (SELECT source, tok, score, row_number() OVER (
             |    PARTITION BY source ORDER BY score DESC, tok) AS rank
             |  FROM scored)
             |SELECT source, rank, tok, score FROM ranked WHERE rank <= 5
             |ORDER BY source, rank""".stripMargin)),

    // ---- xxhash64 token-stream fingerprints (rows-only: hash fn).
    NamedQuery("t03_fingerprints", (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint"),
        TextOps.approxBpeTokenCount(col("text")).as("approx_bpe_tokens"))
        .orderBy("doc_id")),

    // ---- portable fingerprint twin: same normalization, md5 family →
    // oracle-checked (cross-engine dedup-ledger identity).
    NamedQuery("t05_fingerprints_portable",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.fingerprintPortable(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(array_to_string(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0), chr(1))) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Gopher-style repetition quality signals: duplicate n-gram
    // fractions + top-token concentration, all pure scan-stage
    // expressions (zero shuffle at any corpus size).
    NamedQuery("t08_repetition_stats", (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.dupNgramFrac(col("text"), 2).as("dup_2gram_frac"),
        TextOps.dupNgramFrac(col("text"), 3).as("dup_3gram_frac"),
        TextOps.topTokenFrac(col("text")).as("top_token_frac"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS ts
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, ts,
             |    list_transform(generate_series(2, len(ts)),
             |                   i -> array_to_string(ts[i-1:i], ' ')) AS g2,
             |    list_transform(generate_series(3, len(ts)),
             |                   i -> array_to_string(ts[i-2:i], ' ')) AS g3
             |  FROM t)
             |SELECT doc_id,
             |  CASE WHEN len(g2) = 0 THEN 0.0
             |       ELSE round(1.0 - len(list_distinct(g2))::DOUBLE / len(g2), 6) END
             |    AS dup_2gram_frac,
             |  CASE WHEN len(g3) = 0 THEN 0.0
             |       ELSE round(1.0 - len(list_distinct(g3))::DOUBLE / len(g3), 6) END
             |    AS dup_3gram_frac,
             |  CASE WHEN len(ts) = 0 THEN 0.0
             |       ELSE round(list_max(list_transform(list_distinct(ts),
             |         x -> len(list_filter(ts, y -> y = x))))::DOUBLE / len(ts), 6) END
             |    AS top_token_frac
             |FROM g ORDER BY doc_id""".stripMargin)),

    // ---- PII detection + redaction: emails/phones planted
    // deterministically per doc (the corpus itself is clean word-soup),
    // counted and scrubbed with the SAME RE2-subset patterns on both
    // engines.
    NamedQuery("t09_pii_redaction", (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or 415-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
        .select(
          col("doc_id"),
          TextOps.emailCount(col("text")).as("n_emails"),
          TextOps.phoneCount(col("text")).as("n_phones"),
          TextOps.redactPii(col("text")).as("redacted"))
        .orderBy("doc_id"),
      Some(s"""WITH p AS (
             |  SELECT doc_id,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR)
             |      || '@mail.example.com or 415-555-'
             |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
             |  FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(text, '${TextOps.EmailRe}')) AS n_emails,
             |  len(regexp_extract_all(text, '${TextOps.PhoneRe}')) AS n_phones,
             |  regexp_replace(regexp_replace(text, '${TextOps.EmailRe}', '<EMAIL>', 'g'),
             |                 '${TextOps.PhoneRe}', '<PHONE>', 'g') AS redacted
             |FROM p ORDER BY doc_id""".stripMargin)),

    // ---- normalization-aware exact dedup: byte-exact dedup misses
    // whitespace/Unicode VARIANTS of the same text; hashing the
    // NFC-normalized form collapses them. Planted variants (doubled
    // spaces + a decomposed suffix vs the composed original) must
    // dedup INTO their originals — the composition normalizeText →
    // dropExactDups that motivates the cleaning pass.
    NamedQuery("d17_normalized_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        // variant: doubled internal spaces + decomposed " café" tail;
        // original gets the composed tail so raw bytes differ but the
        // normalized forms agree
        val originals = docs.withColumn("text", concat(col("text"), lit(" café")))
        val variants = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(regexp_replace(col("text"), " ", "  "), lit("  café"))
              .as("text"))
        val all = originals.unionByName(variants)
          .select(col("doc_id"), TextOps.normalizeText(col("text")).as("text"))
        Dedup.dropExactDups(all, "doc_id", "text")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text || ' ' || 'caf' || chr(233) AS text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |    replace(text, ' ', '  ') || '  cafe' || chr(769)
             |  FROM documents WHERE doc_id % 5 = 0),
             |n AS (SELECT doc_id,
             |    trim(regexp_replace(nfc_normalize(text), '[ \t\n\r]+', ' ', 'g')) AS norm
             |  FROM all_docs)
             |SELECT doc_id FROM (
             |  SELECT doc_id, row_number() OVER (
             |    PARTITION BY md5(norm) ORDER BY doc_id) AS rn
             |  FROM n) WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),

    // ---- corpus snapshot delta: FULL OUTER join of two corpus
    // versions on doc id, classifying every row added / removed /
    // changed (content hash differs) / unchanged — the incremental-
    // snapshot audit a continuously-rebuilt corpus runs between
    // releases. v2 simulates a release: every 13th doc dropped, every
    // 17th edited, a small new batch appended. One id-keyed shuffle
    // join; content comparison by md5, never by full text.
    NamedQuery("p08_snapshot_delta",
      (s, dir) => {
        val v1 = Tables.documents(s, dir).select(col("doc_id"),
          md5(col("text")).as("h1"))
        val v2base = Tables.documents(s, dir).filter(col("doc_id") % 13 =!= 0)
        val v2 = v2base.select(col("doc_id"),
            md5(when(col("doc_id") % 17 === 0, concat(col("text"), lit(" [edited]")))
              .otherwise(col("text"))).as("h2"))
          .unionByName(v2base.filter(col("doc_id") % 19 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              md5(concat(lit("new "), col("text"))).as("h2")))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .withColumn("status",
            when(col("h1").isNull, lit("added"))
              .when(col("h2").isNull, lit("removed"))
              .when(col("h1") === col("h2"), lit("unchanged"))
              .otherwise(lit("changed")))
          .groupBy("status")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
          .orderBy("status")
      },
      Some("""WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
             |v2 AS (
             |  SELECT doc_id,
             |    md5(CASE WHEN doc_id % 17 = 0 THEN text || ' [edited]'
             |             ELSE text END) AS h2
             |  FROM documents WHERE doc_id % 13 != 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, md5('new ' || text)
             |  FROM documents WHERE doc_id % 13 != 0 AND doc_id % 19 = 0),
             |j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, h1, h2
             |      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
             |SELECT CASE WHEN h1 IS NULL THEN 'added'
             |            WHEN h2 IS NULL THEN 'removed'
             |            WHEN h1 = h2 THEN 'unchanged'
             |            ELSE 'changed' END AS status,
             |  count(*) AS n_docs, min(doc_id) AS min_doc
             |FROM j GROUP BY 1 ORDER BY status""".stripMargin)),

    // ---- temperature-smoothed mixture rebalance (α=0.5): big sources
    // downsampled toward √(n_min/n_s), small ones kept whole — the
    // data-mix flattening pass. q is bit-identical cross-engine (exact
    // ints through correctly-rounded sqrt/div), so the per-source keep
    // counts hash-match exactly.
    NamedQuery("p07_temperature_mix",
      (s, dir) => Sampling.temperatureMix(Tables.documents(s, dir),
          "source", col("text"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("min_kept_id"))
        .orderBy("source"),
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
             |t AS (SELECT source,
             |    CAST(floor(round(least(1.0,
             |      sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE) / n)), 6)
             |      * 1000000) AS BIGINT) AS thr
             |  FROM c)
             |SELECT d.source, count(*) AS n_kept, min(d.doc_id) AS min_kept_id
             |FROM documents d JOIN t ON d.source = t.source
             |WHERE CAST('0x' || substr(md5(d.text), 1, 8) AS BIGINT) % 1000000 < t.thr
             |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // ---- TARGET-SHARE mixture construction (p07's successor: the
    // data-mix SPEC realized): four sources get explicit token
    // shares against a 20k-token budget — src0's allocation exceeds
    // its size (rate caps at 1, keeps everything), src1/src2/src3
    // downsample to their shares, every other source drops. Realized
    // per-source doc/token totals are the gate; the oracle replays
    // the integer target math, the one IEEE division, and the hash
    // filter exactly.
    NamedQuery("p20_target_mix",
      (s, dir) => Sampling.targetMix(Tables.documents(s, dir),
          "source", TextOps.tokenCount(col("text")).cast("long"),
          col("text"),
          targetSharePct = Map("src0" -> 50, "src1" -> 5, "src2" -> 2,
            "src3" -> 1),
          budgetTokens = 20000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("tok_kept"),
          min("doc_id").as("min_kept_id"))
        .orderBy("source"),
      Some("""WITH tk AS (SELECT doc_id, source, text,
             |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                    x -> len(x) > 0))::BIGINT AS ntok
             |  FROM documents),
             |c AS (SELECT source, sum(ntok) AS n FROM tk GROUP BY source),
             |sp AS (SELECT * FROM (VALUES ('src0', 10000), ('src1', 1000),
             |                             ('src2', 400), ('src3', 200))
             |       AS v(source, t)),
             |thr AS (SELECT c.source,
             |    CAST(floor(round(least(1.0, CAST(t AS DOUBLE) / n), 6)
             |      * 1000000) AS BIGINT) AS thr
             |  FROM c JOIN sp ON c.source = sp.source)
             |SELECT tk.source AS source, count(*) AS n_kept,
             |  CAST(sum(ntok) AS BIGINT) AS tok_kept,
             |  min(doc_id) AS min_kept_id
             |FROM tk JOIN thr ON tk.source = thr.source
             |WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1000000
             |      < thr.thr
             |GROUP BY tk.source ORDER BY tk.source""".stripMargin)),

    // ---- CURRICULUM-staged training order (p21): every document gets
    // one deterministic global position — stages by the frozen t19
    // quality prob (ascending: low-score docs first; negate the score
    // for quality-first), pseudo-shuffled within each stage by the p06
    // content-hash order. The corpus only pays (stage, shard)-keyed
    // windows; the global offsets come from the tiny per-cell count
    // frame (the io11 construction applied to training order). The
    // oracle replays the scorer arithmetic AND the full offset
    // construction as one global row_number.
    NamedQuery("p21_curriculum_order",
      (s, dir) => {
        val scored = graft.ml.QualityModel.scoreFixed(
          Tables.documents(s, dir), "doc_id", "text", enStop)
        Sampling.curriculumOrder(scored.select("id", "prob"), "id",
            col("prob"), boundaries = Seq(0.3, 0.6, 0.85), nShards = 8,
            salt = "cur1")
          .orderBy("seq")
      },
      Some(s"""WITH ${qualityModelCtes("documents")},
             |p AS (SELECT id, round(1.0 / (1.0 + exp(-z)), 4) AS prob FROM z),
             |r AS (SELECT id,
             |    (CASE WHEN prob >= 0.3 THEN 1 ELSE 0 END
             |     + CASE WHEN prob >= 0.6 THEN 1 ELSE 0 END
             |     + CASE WHEN prob >= 0.85 THEN 1 ELSE 0 END) AS stage,
             |    md5('cur1|' || CAST(id AS VARCHAR)) AS hx
             |  FROM p),
             |sh AS (SELECT id, stage, hx,
             |    CAST(CAST('0x' || substr(hx, 1, 8) AS BIGINT) % 8 AS INT) AS shard
             |  FROM r)
             |SELECT id, stage, shard, row_number() OVER (
             |    ORDER BY stage, shard, hx, id) AS seq
             |FROM sh ORDER BY seq""".stripMargin)),

    // ---- LENGTH-bucketed batch assembly with padding accounting
    // (p22): docs bucket by token count (width 64), hash-shard within
    // the bucket, and cut into 32-doc batches per (bucket, shard)
    // cell — batching needs length-homogeneity, not bucket-global
    // contiguity, so the keyed window runs over bucket·shard cells and
    // reducers stay bounded at any corpus size. padding_waste =
    // n_docs·max_len − sum_len is the KPI this operator exists for
    // (what a batch pads to its own max costs vs useful tokens).
    NamedQuery("p22_length_bucket_batches",
      (s, dir) => Sampling.lengthBucketBatches(
          Tables.documents(s, dir), "doc_id",
          TextOps.tokenCount(col("text")), bucketWidth = 64,
          batchSize = 32, nShards = 4, salt = "lb1")
        .orderBy("bucket", "shard", "batch_idx"),
      Some("""WITH tk AS (SELECT doc_id,
             |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                    x -> len(x) > 0))::BIGINT AS ln,
             |    md5('lb1|' || CAST(doc_id AS VARCHAR)) AS hx
             |  FROM documents),
             |b AS (SELECT doc_id, ln, hx,
             |    CAST(floor(ln / 64) AS INT) AS bucket,
             |    CAST(CAST('0x' || substr(hx, 1, 8) AS BIGINT) % 4 AS INT) AS shard
             |  FROM tk),
             |r AS (SELECT *, row_number() OVER (
             |    PARTITION BY bucket, shard ORDER BY hx, doc_id) AS rn FROM b),
             |g AS (SELECT bucket, shard,
             |    CAST(floor((rn - 1) / 32) AS INT) AS batch_idx,
             |    count(*) AS n_docs, max(ln) AS max_len,
             |    CAST(sum(ln) AS BIGINT) AS sum_len
             |  FROM r GROUP BY bucket, shard, batch_idx)
             |SELECT bucket, shard, batch_idx, n_docs, max_len, sum_len,
             |  n_docs * max_len - sum_len AS padding_waste
             |FROM g ORDER BY bucket, shard, batch_idx""".stripMargin)),

    // ---- per-document duplicate-CHUNK fraction (t25, the
    // Gopher/CCNet "duplicate paragraph fraction" rule at corpus
    // scope): planted FRANKENSTEIN docs stitched from two existing
    // docs' token prefixes (%10==6, id+1000000) must score dup_frac
    // near 1.0 — their full text is unique (d01 misses them) and their
    // within-doc repetition is low (t08 misses them); only the
    // cross-corpus chunk pass catches syndication/boilerplate stitching.
    NamedQuery("t25_dup_chunk_fraction",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val franken = docs.filter(col("doc_id") % 10 === 6)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat_ws(" ",
              array_join(slice(TextOps.tokens(col("text")), 1, 32), " "),
              array_join(slice(TextOps.tokens(col("text")), 33, 32), " "))
              .as("text"))
        Dedup.dupChunkFraction(docs.unionByName(franken),
            "doc_id", "text", chunkTokens = 32)
          .orderBy("id")
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS ts
             |  FROM documents),
             |alltoks AS (
             |  SELECT doc_id, ts FROM toks0
             |  UNION ALL
             |  SELECT doc_id + 1000000, ts[1:64] FROM toks0 WHERE doc_id % 10 = 6),
             |ch AS (
             |  SELECT doc_id, i AS idx,
             |    array_to_string(ts[(i * 32 + 1):(i * 32 + 32)], ' ') AS chunk
             |  FROM alltoks, unnest(generate_series(0,
             |    CAST(ceil(len(ts) / 32.0) AS INT) - 1)) AS t(i)
             |  WHERE len(ts) > 0),
             |r AS (SELECT doc_id, idx, chunk, row_number() OVER (
             |    PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM ch)
             |SELECT doc_id AS id, count(*) AS n_chunks,
             |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |  round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
             |    AS dup_frac
             |FROM r GROUP BY doc_id ORDER BY id""".stripMargin)),

    // ---- persisted BPE tokenizer ARTIFACT (t26): the tokenizer the
    // corpus pipeline actually SHIPS — train the merge table on a
    // sub-corpus (%10=0), persist it (the merges file, the exact
    // artifact production tokenizers distribute), then encode the
    // FULL corpus from the artifact by replaying the merges over the
    // serve corpus's own distinct tokens. This is the serving path
    // t17's join-back encode can't give: 90% of the serve docs were
    // never seen in training, and their OOV tokens must still
    // segment under the frozen merges. Replay is a fold of k literal
    // replaces over the vocabulary-sized token table (one codegen'd
    // projection); the oracle unrolls the same replay per round.
    NamedQuery("t26_bpe_artifact_encode",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("bpe_artifact")
        TextOps.writeBpeArtifact(docs.filter(col("doc_id") % 10 === 0),
          "text", merges = 6, path)
        TextOps.bpeEncodeFromArtifact(docs, "doc_id", "text", path)
          .orderBy("id")
      },
      Some(bpeArtifactEncodeOracle(6, trainWhere = "doc_id % 10 = 0"))),

    // ---- tokenizer vocab EXTENSION (t27): continued BPE training on
    // the persisted artifact — 4 merges train on the original
    // sub-corpus (%10=0), then the corpus GROWS (%10∈{0,5}) and 2
    // more rounds train on it with the first 4 FROZEN (old-vocab
    // encodings stay reproducible — how production tokenizers version
    // vocab growth). The grown corpus's frequency table is segmented
    // by replaying the frozen merges before the new rounds count
    // pairs; the appended artifact reads back as the full 6-row merge
    // table, which the oracle re-derives end to end.
    NamedQuery("t27_bpe_vocab_extend",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("bpe_artifact_ext")
        TextOps.writeBpeArtifact(docs.filter(col("doc_id") % 10 === 0),
          "text", merges = 4, path)
        TextOps.extendBpeArtifact(
          docs.filter(col("doc_id") % 10 === 0 || col("doc_id") % 10 === 5),
          "text", moreMerges = 2, path)
      },
      Some(bpeExtendOracle(4, 2, trainWhere = "doc_id % 10 = 0",
        extWhere = "doc_id % 10 = 0 OR doc_id % 10 = 5"))),

    // ---- proportional source-INTERLEAVE schedule (p23): stride
    // scheduling for the training stream — pos = (rank_s − ½)/n_s in
    // (0,1); consuming in pos order holds every prefix to each
    // source's share within one row (the mixing guarantee p21's
    // staging deliberately does not give). Within-source rank via the
    // p21 offset construction — reducers stay bounded. The aggregate
    // gate checks the whole schedule: per source, count, the mean pos
    // (≈ 0.5 for every source iff striding is even), and the first
    // scheduled doc.
    NamedQuery("p23_source_interleave",
      (s, dir) => Sampling.interleaveBySource(Tables.documents(s, dir),
          "doc_id", "source", nShards = 4, salt = "mix1")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("pos"), 6).as("mean_pos"),
          min(when(col("rank_in_source") === 1, col("doc_id"))).as("first_doc"))
        .orderBy("source"),
      Some("""WITH h AS (SELECT doc_id, source,
             |    md5('mix1|' || CAST(doc_id AS VARCHAR)) AS hx
             |  FROM documents),
             |sh AS (SELECT doc_id, source, hx,
             |    CAST(CAST('0x' || substr(hx, 1, 8) AS BIGINT) % 4 AS INT) AS shard
             |  FROM h),
             |r AS (SELECT doc_id, source, row_number() OVER (
             |    PARTITION BY source ORDER BY shard, hx, doc_id) AS rank_in_source
             |  FROM sh),
             |n AS (SELECT source, count(*) AS total FROM r GROUP BY source),
             |p AS (SELECT r.doc_id, r.source, r.rank_in_source,
             |    round((r.rank_in_source - 0.5) / n.total, 9) AS pos
             |  FROM r JOIN n ON r.source = n.source)
             |SELECT source, count(*) AS n_docs,
             |  round(avg(pos), 6) AS mean_pos,
             |  min(CASE WHEN rank_in_source = 1 THEN doc_id END) AS first_doc
             |FROM p GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Unicode NFC text normalization (the cleaning pass before
    // any hash-based dedup): every doc gets a planted DECOMPOSED
    // suffix (e + U+0301, mixed whitespace), so composition and
    // whitespace collapse both do real work — byte lengths and the
    // md5 of the normalized text are hash-checked against DuckDB's
    // nfc_normalize.
    NamedQuery("t11_normalized_text",
      (s, dir) => {
        val dirty = concat(col("text"), lit("  e\u0301\n\tcafe\u0301"))
        Tables.documents(s, dir).select(col("doc_id"), dirty.as("dirty"))
          .select(col("doc_id"),
            substring(md5(TextOps.normalizeText(col("dirty"))), 1, 8).as("hash8"),
            octet_length(TextOps.normalizeText(col("dirty"))).as("n_bytes_norm"),
            octet_length(col("dirty")).as("n_bytes_raw"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    text || '  e' || chr(769) || chr(10) || chr(9) || 'cafe' || chr(769) AS dirty
             |  FROM documents),
             |n AS (SELECT doc_id, dirty,
             |    trim(regexp_replace(nfc_normalize(dirty), '[ \t\n\r]+', ' ', 'g')) AS norm
             |  FROM p)
             |SELECT doc_id, substr(md5(norm), 1, 8) AS hash8,
             |  octet_length(encode(norm)) AS n_bytes_norm,
             |  octet_length(encode(dirty)) AS n_bytes_raw
             |FROM n ORDER BY doc_id""".stripMargin)),

    // ---- distribution-cutoff quality filter: drop the shortest 10%
    // of docs WITHIN each source (rank-based, so the cutoff adapts to
    // each source's own length distribution — a fixed global threshold
    // over- or under-prunes heterogeneous sources). Keyed windows:
    // rank + count partition by source, never a global sort.
    NamedQuery("t10_quality_cutoff",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables.documents(s, dir).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        val byLen = Window.partitionBy("source")
          .orderBy(col("n_tokens"), col("doc_id"))
        val bySource = Window.partitionBy("source")
        t.withColumn("rk", row_number().over(byLen))
          .withColumn("n", count(lit(1)).over(bySource))
          .withColumn("dropped", col("rk") <= ceil(col("n") * lit(0.1)))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("dropped"), lit(1L)).otherwise(lit(0L))).as("n_dropped"),
            min(when(!col("dropped"), col("n_tokens"))).as("min_kept_tokens"))
          .orderBy("source")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                    x -> len(x) > 0)) AS n_tokens
             |  FROM documents),
             |r AS (
             |  SELECT source, n_tokens,
             |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rk,
             |    count(*) OVER (PARTITION BY source) AS n
             |  FROM t)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN rk <= ceil(n * 0.1) THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dropped,
             |  min(CASE WHEN rk > ceil(n * 0.1) THEN n_tokens END) AS min_kept_tokens
             |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    // ---- chunk-level exact dedup (the sub-document/paragraph pass):
    // documents ∪ planted copies split into 20-token chunks; every
    // distinct chunk keeps its first (id, idx) occurrence — all planted
    // chunks must drop.
    NamedQuery("d09_chunk_dedup", (s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
      Dedup.chunkDedup(docs.unionByName(planted), "doc_id", "text",
          chunkTokens = 20)
        .orderBy("id", "idx")
    },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
             |t AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS ts
             |  FROM all_docs),
             |chunks AS (
             |  SELECT doc_id AS id, i.c AS idx,
             |    array_to_string(ts[i.c*20+1 : least((i.c+1)*20, len(ts))], ' ') AS chunk
             |  FROM t CROSS JOIN LATERAL (SELECT unnest(generate_series(
             |    0, CAST(ceil(len(ts) / 20.0) AS INT) - 1)) AS c) i),
             |ranked AS (
             |  SELECT id, idx, chunk,
             |    row_number() OVER (PARTITION BY chunk ORDER BY id, idx) AS rn
             |  FROM chunks)
             |SELECT id, idx, chunk FROM ranked WHERE rn = 1
             |ORDER BY id, idx""".stripMargin)),

    // ---- CONTENT-DEFINED chunk dedup (d09's insertion-robust
    // sibling — the rsync/LBFS boundary rule): every doc is replayed
    // with a 2-char PREFIX INSERTION, the edit that re-cuts every
    // fixed-width chunk; CDC boundaries re-synchronize within ~w
    // chars, so the replay's chunks dedup against the originals. The
    // oracle replays the polynomial rolling hash (B=257, P=1e9+7,
    // powers inlined), every boundary, every chunk slice, and the
    // first-occurrence rule.
    NamedQuery("d28_cdc_chunk_dedup", (s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(lit("Z "), col("text")).as("text"))
      Dedup.cdcChunkDedup(docs.unionByName(planted), "doc_id", "text",
          w = 16, d = 64)
        .orderBy("id", "idx")
    },
      Some {
        val pw = Iterator.iterate(1L)(p => p * 257 % 1000000007L)
          .take(16).mkString("[", ", ", "]")
        s"""WITH all_docs AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + 1000000, 'Z ' || text FROM documents),
           |c AS (SELECT doc_id, text, len(text) AS n FROM all_docs
           |      WHERE len(text) > 0),
           |b AS (SELECT doc_id, text, n,
           |    list_sort(list_append(
           |      list_filter(generate_series(16, n - 1), i ->
           |        (list_sum(list_transform(generate_series(0, 15), k ->
           |           CAST(unicode(text[i-k:i-k]) AS BIGINT) * ($pw)[k+1]))
           |         % 1000000007) % 64 = 0),
           |      n)) AS ends
           |  FROM c),
           |chunks AS (
           |  SELECT doc_id AS id, e.k - 1 AS idx,
           |    text[CASE WHEN e.k = 1 THEN 1 ELSE ends[e.k - 1] + 1 END
           |         : ends[e.k]] AS chunk
           |  FROM b CROSS JOIN LATERAL (SELECT unnest(generate_series(
           |    1, len(ends))) AS k) e),
           |ranked AS (
           |  SELECT id, idx, chunk,
           |    row_number() OVER (PARTITION BY chunk ORDER BY id, idx) AS rn
           |  FROM chunks)
           |SELECT id, idx, chunk FROM ranked WHERE rn = 1
           |ORDER BY id, idx""".stripMargin
      }),

    // ---- per-label centroids + nearest-centroid assignment: the
    // known-label sibling of KMeans assignment (centroid table is
    // labels × dim → broadcast; corpus scanned once).
    NamedQuery("s05_centroid_assign",
      (s, dir) => Similarity.centroidAssign(
          Tables.embeddings(s, dir), "vec_id", "embedding", "label")
        .select(col("id").as("vec_id"), col("label"), col("assigned"), col("cos"))
        .orderBy("vec_id"),
      Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |ex AS (SELECT label, unnest(v) AS x,
             |    unnest(generate_series(1, len(v))) AS pos FROM e),
             |cm AS (SELECT label, pos, avg(x) AS cx FROM ex GROUP BY label, pos),
             |cent AS (SELECT label AS clabel, list(cx ORDER BY pos) AS c
             |  FROM cm GROUP BY label),
             |cn AS (SELECT clabel, c,
             |    sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm FROM cent),
             |sc AS (SELECT e.vec_id, e.label, cn.clabel,
             |    round(${dotSql("e.v", "cn.c")}
             |      / (sqrt(${dotSql("e.v", "e.v")}) * cn.cnrm), 4) AS cos
             |  FROM e CROSS JOIN cn),
             |r AS (SELECT vec_id, label, clabel AS assigned, cos,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
             |  FROM sc)
             |SELECT vec_id, label, assigned, cos FROM r WHERE rn = 1
             |ORDER BY vec_id""".stripMargin)),

    // ---- diversity-balanced sampling (SemDeDup-style subset
    // selection): assign every embedding to its nearest label
    // centroid (s05's stage), then keep a deterministic bottom-k-hash
    // sample PER CENTROID (p11's stage) — equal representation from
    // every region of embedding space, where a uniform sample
    // over-draws the dense clusters. Composed oracle: the s05
    // assignment CTEs feeding the p11 hash-rank window.
    NamedQuery("s11_diverse_sample",
      (s, dir) => {
        val a = Similarity.centroidAssign(
            Tables.embeddings(s, dir), "vec_id", "embedding", "label")
          .select(col("id"), col("assigned"))
        Sampling.sampleKPerGroup(a, "assigned", "id", k = 10)
          .select(col("assigned"), col("id").as("vec_id"), col("sample_rank"))
          .orderBy("assigned", "sample_rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |ex AS (SELECT label, unnest(v) AS x,
             |    unnest(generate_series(1, len(v))) AS pos FROM e),
             |cm AS (SELECT label, pos, avg(x) AS cx FROM ex GROUP BY label, pos),
             |cent AS (SELECT label AS clabel, list(cx ORDER BY pos) AS c
             |  FROM cm GROUP BY label),
             |cn AS (SELECT clabel, c,
             |    sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm FROM cent),
             |sc AS (SELECT e.vec_id, cn.clabel,
             |    round(${dotSql("e.v", "cn.c")}
             |      / (sqrt(${dotSql("e.v", "e.v")}) * cn.cnrm), 4) AS cos
             |  FROM e CROSS JOIN cn),
             |r AS (SELECT vec_id, clabel AS assigned, row_number() OVER (
             |    PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
             |  FROM sc),
             |a AS (SELECT assigned, vec_id FROM r WHERE rn = 1),
             |h AS (SELECT assigned, vec_id,
             |    CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 13) AS BIGINT)
             |      AS h
             |  FROM a),
             |rk AS (SELECT assigned, vec_id, row_number() OVER (
             |    PARTITION BY assigned ORDER BY h, vec_id) AS sample_rank FROM h)
             |SELECT assigned, vec_id, CAST(sample_rank AS INT) AS sample_rank
             |FROM rk WHERE sample_rank <= 10
             |ORDER BY assigned, sample_rank""".stripMargin)),

    // ---- token-budget shard packing (the sequence-packing precursor):
    // within each source stream, docs are assigned to consecutive
    // shards of ≤2048 tokens by an exclusive running token count.
    // The window is PARTITIONED BY SOURCE — the per-stream keyed form
    // that scales (a single global ordering would serialize the whole
    // corpus through one partition).
    NamedQuery("p05_token_shards", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("cum", coalesce(sum("n_tokens").over(w), lit(0L)))
        .withColumn("shard", floor(col("cum") / 2048.0).cast("long"))
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("source", "shard")
    },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                    x -> len(x) > 0)) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, source, n_tokens,
             |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM t)
             |SELECT source, CAST(floor(cum / 2048.0) AS BIGINT) AS shard,
             |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
             |FROM c GROUP BY 1, 2 ORDER BY source, shard""".stripMargin)),

    // ---- sequence packing WITH intra-doc splitting (the step after
    // token sharding): docs concatenate per source stream and slice
    // into 512-token training sequences; a doc crossing a boundary
    // contributes a span to each sequence it overlaps. Every sequence
    // but the last per stream must pack to exactly 512 tokens — the
    // oracle replays the integer span arithmetic and pins that.
    NamedQuery("p13_sequence_packing", (s, dir) =>
      Sampling.packSequences(Tables.documents(s, dir), "source", "doc_id",
          "text", seqLen = 512)
        .groupBy("source", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        .orderBy("source", "seq_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                    x -> len(x) > 0)) AS n
             |  FROM documents),
             |nz AS (SELECT * FROM t WHERE n > 0),
             |c AS (
             |  SELECT doc_id, source, n,
             |    coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM nz),
             |spans AS (
             |  SELECT source, doc_id, n, cum,
             |    unnest(generate_series(CAST(cum // 512 AS BIGINT),
             |                           CAST((cum + n - 1) // 512 AS BIGINT))) AS seq_id
             |  FROM c)
             |SELECT source, CAST(seq_id AS BIGINT) AS seq_id,
             |  count(*) AS n_docs,
             |  CAST(sum(least((seq_id + 1) * 512, cum + n)
             |         - greatest(seq_id * 512, cum)) AS BIGINT) AS n_tokens
             |FROM spans GROUP BY 1, 2 ORDER BY source, seq_id""".stripMargin)),

    // ---- token-budget corpus selection: greedy best-quality-first
    // until a 20k-token budget is spent. Score = distinct-stopword
    // hits (0..10, the sw07 list) — deliberately coarse, so the
    // per-score histogram that replaces the naive global ordered
    // cumsum stays tiny; only the single score group straddling the
    // budget pays a window. Oracle = the naive global-window form —
    // same selected set, which is exactly the point.
    NamedQuery("p14_budget_select", (s, dir) => {
      val docs = Tables.documents(s, dir)
      Sampling.budgetSelect(docs, "doc_id",
          scoreCol = size(array_intersect(
            array_distinct(TextOps.tokens(col("text"))),
            typedLit(TextOps.langMarkers.head._2))),
          weightCol = TextOps.tokenCount(col("text")),
          budget = 20000L)
        .select(col("id").as("doc_id"), col("score"), col("w").as("n_tokens"))
        .orderBy("doc_id")
    },
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS ts
             |  FROM documents),
             |m AS (SELECT doc_id,
             |    CAST(len(list_intersect(list_distinct(ts),
             |      ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'for']))
             |      AS BIGINT) AS score,
             |    CAST(len(ts) AS BIGINT) AS n_tokens
             |  FROM t),
             |c AS (SELECT *,
             |    coalesce(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM m)
             |SELECT doc_id, score, n_tokens FROM c
             |WHERE cum < 20000 ORDER BY doc_id""".stripMargin)),

    // ---- leakage-safe train/val/test split: hash the near-dup
    // CLUSTER label, not the document — a doc and its near-copies
    // land in the SAME split by construction, so train can never see
    // a paraphrase of a test doc (the standard eval-contamination
    // hole in naive per-doc hashing; DedupSpec pins the counterfactual).
    // Composition: banded pairs (shared memoized signatures) →
    // min-label components → one scan-stage hash on the label.
    NamedQuery("p16_leakage_safe_split",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
        Dedup.nearDupClusterLabels(docs.unionByName(planted), "doc_id",
            "text", n = 3, numHashes = MhHashes, bands = MhBands,
            minJaccard = 0.5, iters = 4,
            sig = Some(plantedMinhashSig(s, dir)))
          .withColumn("split", Sampling.splitLabel(col("label").cast("string")))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("label")).as("n_clusters"))
          .orderBy("split")
      },
      Some(leakageSplitOracle(MhHashes, MhBands, 0.5, iters = 4))),

    // ---- BPE merge-candidate counts (tokenizer-training inner loop):
    // adjacent char-pair frequencies weighted by word frequency — one
    // corpus pass to the vocab table, pair explode over the VOCAB only.
    NamedQuery("t12_bpe_pair_counts", (s, dir) =>
      TextOps.bpePairCounts(Tables.documents(s, dir), "text")
        .orderBy(col("cnt").desc, col("pair")).limit(50),
      Some("""WITH toks AS (
             |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                            x -> len(x) > 0)) AS tok
             |  FROM documents),
             |tf AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
             |pairs AS (
             |  SELECT substr(tok, i, 2) AS pair, c
             |  FROM tf, unnest(generate_series(1, len(tok) - 1)) AS t(i)
             |  WHERE len(tok) >= 2)
             |SELECT pair, CAST(sum(c) AS BIGINT) AS cnt FROM pairs
             |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50""".stripMargin)),

    // ---- iterative BPE trainer: 6 merge rounds (count pairs over
    // the word-frequency table → merge best → re-segment), the full
    // tokenizer-training loop on top of t12's single statistic.
    // Oracle = the same 6 rounds as unrolled CTEs (the g10/g12
    // pattern); tie-break (cnt DESC, pair ASC) is a total order both
    // engines share, and the space-joined-segmentation replace is
    // left-to-right non-overlapping in both.
    NamedQuery("t16_bpe_merges", (s, dir) =>
      TextOps.bpeTrain(Tables.documents(s, dir), "text", merges = 6)
        .orderBy("step"),
      Some(bpeOracle(6))),

    // ---- BPE encode: apply the 6 trained merges back to the corpus
    // and count subword pieces per doc — the corpus-budget statistic.
    // The encode is a token-explode joined to the BROADCAST vocab
    // segmentation table (training already segmented every distinct
    // token), never a per-document merge replay.
    NamedQuery("t17_bpe_encoded_counts", (s, dir) =>
      TextOps.bpeEncodedCounts(Tables.documents(s, dir), "doc_id", "text",
          merges = 6)
        .orderBy("id"),
      Some(bpeEncodeOracle(6))),

    // ---- BPE decode + round-trip invariant (t21): decode the t17
    // encoding back to text and prove decode(encode(x)) ≡
    // normalized(x) per document — both engines replay train, encode,
    // decode, AND the comparison independently, so a decoder bug on
    // either side breaks the hash. Closes the tokenizer loop.
    NamedQuery("t21_bpe_decode_roundtrip", (s, dir) =>
      TextOps.bpeDecodeRoundTrip(Tables.documents(s, dir), "doc_id", "text",
          merges = 6)
        .orderBy("id"),
      Some(bpeDecodeOracle(6))),

    // ---- bigram-LM surprisal (conditional sibling of t06): per-doc
    // mean -ln p(w2|w1) under add-one smoothing — the self-hosted
    // KenLM-shaped fluency score; both tails (formulaic / gibberish)
    // get cut in quality filtering. Bigram counts join on the (w1,w2)
    // KEY (bigram vocab grows with the corpus — never broadcast);
    // unigram table + V broadcast.
    NamedQuery("t18_bigram_surprisal", (s, dir) =>
      TextOps.bigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("id"),
      Some("""WITH t AS (
             |  SELECT doc_id AS id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts
             |  FROM documents),
             |toks AS (SELECT id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i
             |  FROM t),
             |big AS (SELECT a.id, a.tok AS w1, b.tok AS w2
             |  FROM toks a JOIN toks b ON a.id = b.id AND b.i = a.i + 1),
             |uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
             |vv AS (SELECT count(*) AS v FROM uni),
             |c2 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
             |sc AS (
             |  SELECT big.id, count(*) AS n_bigrams,
             |    round(-avg(ln((c12 + 1.0) / (c1 + v))), 4) AS surprisal
             |  FROM big JOIN c2 USING (w1, w2)
             |    JOIN uni ON big.w1 = uni.tok CROSS JOIN vv
             |  GROUP BY big.id)
             |SELECT t.id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
             |  coalesce(sc.surprisal, 0.0) AS surprisal
             |FROM t LEFT JOIN sc USING (id) ORDER BY id""".stripMargin)),

    // ---- TRAIN/APPLY LM surprisal (t22, the CCNet shape): the bigram
    // LM is fit on the held-out curated slice (doc_id%10=0 — the same
    // reference-slice convention as d14/d18) and scores the REST of
    // the corpus — "how unlike the reference does this read". Unseen
    // bigrams/unigrams score under add-one smoothing, so every doc
    // gets a value; LEFT joins replace t18's inner joins.
    NamedQuery("t22_crossent_surprisal",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextOps.bigramSurprisalFrom(
            docs.filter(col("doc_id") % 10 === 0),
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
          .orderBy("id")
      },
      Some("""WITH rt AS (
             |  SELECT doc_id AS id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts
             |  FROM documents WHERE doc_id % 10 = 0),
             |rtoks AS (SELECT id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i
             |  FROM rt),
             |rbig AS (SELECT a.tok AS w1, b.tok AS w2
             |  FROM rtoks a JOIN rtoks b ON a.id = b.id AND b.i = a.i + 1),
             |uni AS (SELECT tok, count(*) AS c1 FROM rtoks GROUP BY tok),
             |vv AS (SELECT count(*) AS v FROM uni),
             |c2 AS (SELECT w1, w2, count(*) AS c12 FROM rbig GROUP BY 1, 2),
             |at AS (
             |  SELECT doc_id AS id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts
             |  FROM documents WHERE doc_id % 10 != 0),
             |atoks AS (SELECT id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i
             |  FROM at),
             |abig AS (SELECT a.id, a.tok AS w1, b.tok AS w2
             |  FROM atoks a JOIN atoks b ON a.id = b.id AND b.i = a.i + 1),
             |sc AS (
             |  SELECT abig.id, count(*) AS n_bigrams,
             |    round(-avg(ln((coalesce(c12, 0) + 1.0) /
             |                  (coalesce(c1, 0) + v))), 4) AS surprisal
             |  FROM abig LEFT JOIN c2 USING (w1, w2)
             |    LEFT JOIN uni ON abig.w1 = uni.tok CROSS JOIN vv
             |  GROUP BY abig.id)
             |SELECT at.id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
             |  coalesce(sc.surprisal, 0.0) AS surprisal
             |FROM at LEFT JOIN sc USING (id) ORDER BY id""".stripMargin)),

    // ---- sliding-window chunking with stride (RAG/embedding
    // pre-chunking; d09's fixed splitter is the dedup sibling):
    // 32-token windows every 16 tokens — consecutive chunks overlap by
    // 16 so no boundary sentence is lost to both neighbours. Pure
    // scan-stage generator, zero shuffle (ordered output only here).
    NamedQuery("t13_sliding_chunks", (s, dir) =>
      TextOps.slidingChunks(Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 32, strideTokens = 16)
        .orderBy("id", "idx"),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS ts
             |  FROM documents),
             |w AS (
             |  SELECT doc_id, ts,
             |    CASE WHEN len(ts) = 0 THEN -1
             |         ELSE CAST(floor((len(ts) - 1) / 16.0) AS INTEGER) END AS maxw
             |  FROM toks),
             |ch AS (
             |  SELECT doc_id, i AS idx,
             |    array_to_string(ts[i * 16 + 1 : i * 16 + 32], ' ') AS chunk
             |  FROM w, unnest(generate_series(0, maxw)) AS t(i)
             |  WHERE maxw >= 0)
             |SELECT doc_id AS id, CAST(idx AS BIGINT) AS idx, chunk
             |FROM ch ORDER BY id, idx""".stripMargin)),

    // ---- deterministic shuffle-shard export: reproducible pseudo-
    // random order (md5 of salted id) in 16 independent shards; the
    // per-shard window never sees more than corpus/nShards rows.
    // first_doc probes the within-shard ORDER, not just membership.
    NamedQuery("p06_shuffle_shards",
      (s, dir) => Sampling.shuffleShards(Tables.documents(s, dir), "doc_id",
          nShards = 16, salt = "epoch0")
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min(when(col("pos") === 1, col("doc_id"))).as("first_doc"))
        .orderBy("shard"),
      Some(shuffleShardOracle)),

    // ---- int8 embedding quantization: per-vector scale / q checksum /
    // reconstruction MSE, all sequential-fold double arithmetic so the
    // oracle replays it exactly (rounded only at the emit boundary).
    NamedQuery("s06_quantize_int8",
      (s, dir) => Similarity.quantizeInt8(Tables.embeddings(s, dir),
          "vec_id", "embedding")
        .select(col("vec_id"), round(col("scale"), 6).as("scale_r"),
          round(col("mse"), 8).as("mse_r"),
          element_at(col("q"), 1).cast("long").as("q0"),
          aggregate(col("q"), lit(0L), _ + _).as("q_sum"))
        .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |s AS (SELECT vec_id, v,
             |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             |  FROM e),
             |q AS (SELECT vec_id, v, scale,
             |    CASE WHEN scale > 0
             |         THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
             |         ELSE list_transform(v, x -> 0) END AS qv
             |  FROM s),
             |m AS (SELECT vec_id, scale, qv,
             |    list_sum(list_transform(generate_series(1, len(v)),
             |      i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale))) / len(v) AS mse
             |  FROM q)
             |SELECT vec_id, round(scale, 6) AS scale_r, round(mse, 8) AS mse_r,
             |  CAST(qv[1] AS BIGINT) AS q0,
             |  CAST(list_sum(qv) AS BIGINT) AS q_sum
             |FROM m ORDER BY vec_id""".stripMargin)),

    // ---- product-quantization encode: every embedding → m=4 code
    // indices + reconstruction MSE (fixed seeded codebooks inlined on
    // both engines — every code and error replayed bit-for-bit).
    NamedQuery("s07_pq_codes",
      (s, dir) => Similarity.pqEncode(
          Tables.embeddings(s, dir).select("vec_id", "embedding"),
          "vec_id", "embedding", dim = 64, m = PqM, k = PqK, seed = PqSeed)
        .select(Seq(col("vec_id")) ++
          (1 to PqM).map(j => element_at(col("codes"), j).as(s"c$j")) :+
          round(col("mse"), 6).as("mse_r"): _*)
        .orderBy("vec_id"),
      Some(s"""WITH $pqCodesCtes
             |SELECT vec_id, ${(1 to PqM).map(j => s"codes[$j] AS c$j").mkString(", ")},
             |  round(mse, 6) AS mse_r
             |FROM pq ORDER BY vec_id""".stripMargin)),

    // ---- PQ asymmetric-distance top-k: raw queries scan the ENCODED
    // corpus (m ints per row, never the float vectors) — the
    // serving-scale ANN pass over compressed storage. Ranks replayed
    // exactly: distances fold in subspace order on both engines.
    NamedQuery("s08_pq_adc_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val codes = Similarity.pqEncode(emb, "vec_id", "embedding",
          dim = 64, m = PqM, k = PqK, seed = PqSeed).select("vec_id", "codes")
        Similarity.pqAdcTopK(emb.filter(col("vec_id") < 20), codes, topK = 5,
            dim = 64, m = PqM, k = PqK, seed = PqSeed)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $pqCodesCtes,
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
             |adists AS (
             |  SELECT q.query_id, pq.vec_id AS neighbor_id,
             |    round(list_sum(list(
             |      ${pqAdcTermSql} ORDER BY cb.j)), 6) AS adc_dist
             |  FROM q CROSS JOIN pq
             |  JOIN cb ON cb.ci = pq.codes[cb.j + 1]
             |  WHERE q.query_id <> pq.vec_id
             |  GROUP BY q.query_id, pq.vec_id),
             |ranked AS (SELECT query_id, neighbor_id, adc_dist,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY adc_dist, neighbor_id) AS rank
             |  FROM adists)
             |SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- two-stage retrieval: PQ-ADC shortlist (25 candidates/query
    // over the encoded corpus) → exact Euclidean rerank of only those
    // candidates → top-5. The oracle replays both stages: the s08 ADC
    // ranking cut at shortK, then the s03 expansion identity on the
    // shortlisted ids — approximate recall, exact precision, replayed
    // bit-for-bit.
    NamedQuery("s10_two_stage_rerank",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        Similarity.pqRerankTopK(emb.filter(col("vec_id") < 20), emb,
            shortK = 25, k = 5, dim = 64, m = PqM, kCodes = PqK, seed = PqSeed)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $pqCodesCtes,
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
             |adists AS (
             |  SELECT q.query_id, pq.vec_id AS neighbor_id,
             |    round(list_sum(list(
             |      ${pqAdcTermSql} ORDER BY cb.j)), 6) AS adc_dist
             |  FROM q CROSS JOIN pq
             |  JOIN cb ON cb.ci = pq.codes[cb.j + 1]
             |  WHERE q.query_id <> pq.vec_id
             |  GROUP BY q.query_id, pq.vec_id),
             |short AS (SELECT query_id, neighbor_id FROM (
             |    SELECT query_id, neighbor_id, row_number() OVER (
             |      PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rn
             |    FROM adists) WHERE rn <= 25),
             |n AS (SELECT vec_id,
             |    list_sum(list_transform(generate_series(1, len(v)),
             |      i -> v[i] * v[i])) AS nn
             |  FROM e),
             |rer AS (SELECT s.query_id, s.neighbor_id,
             |    round(sqrt(greatest(nq.nn - 2 *
             |      list_sum(list_transform(generate_series(1, 64),
             |        i -> eq.v[i] * ec.v[i])) + nc.nn, 0.0)), 6) AS dist
             |  FROM short s
             |  JOIN e eq ON eq.vec_id = s.query_id
             |  JOIN e ec ON ec.vec_id = s.neighbor_id
             |  JOIN n nq ON nq.vec_id = s.query_id
             |  JOIN n nc ON nc.vec_id = s.neighbor_id),
             |ranked AS (SELECT query_id, neighbor_id, dist,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY dist, neighbor_id) AS rank
             |  FROM rer)
             |SELECT query_id, neighbor_id, dist, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- KMV bottom-k distinct-count sketch per source: mergeable
    // sketch audit instead of exact distinct — deterministic md5
    // bottom-k, so sketch members AND the estimate hash-match (no
    // tolerance band needed).
    NamedQuery("p09_kmv_distinct",
      (s, dir) => Sketches.distinctEstimate(
          Tables.documents(s, dir), "source", "text", k = KmvK)
        .select(col("source"), col("n_sketch").cast("long").as("n_sketch"),
          col("est_distinct"))
        .orderBy("source"),
      Some(s"""WITH $kmvSketchCtes,
             |agg AS (SELECT source, count(*) AS n_sketch,
             |    max(CASE WHEN rn = $KmvK THEN h END) AS hk
             |  FROM sk GROUP BY source)
             |SELECT source, CAST(n_sketch AS BIGINT) AS n_sketch,
             |  round(CASE WHEN n_sketch < $KmvK THEN CAST(n_sketch AS DOUBLE)
             |        ELSE ($KmvK - 1) * 4503599627370496.0 / hk END, 4)
             |    AS est_distinct
             |FROM agg ORDER BY source""".stripMargin)),

    // ---- count-min heavy hitters: d=4 × w=256 salted-md5 sketch over
    // ALL corpus tokens, audited on the exact top-20 — the constant-
    // memory frequency sketch (boilerplate/spam-marker detection at
    // corpus scale). Deterministic cells → the estimates themselves
    // hash-match, and est ≥ true is checked BY the oracle comparison.
    NamedQuery("p17_cms_heavy_hitters",
      (s, dir) => Sketches.cmsHeavyHitters(
          Tables.documents(s, dir), "text", d = 4, w = 256, topN = 20)
        .orderBy(col("true_cnt").desc, col("tok")),
      Some(cmsOracle)),

    // ---- histogram quantile sketch: per-source token-count p50/p90/
    // p99 from a width-16 fixed-width histogram — the constant-memory
    // distribution read (sequence-length planning, quality thresholds)
    // a 100 TB corpus runs instead of a per-source sort. One keyed
    // shuffle into |sources|·|buckets| cells; the cumulative window
    // and quantile extraction run in CELL space. Deterministic → the
    // estimates themselves hash-match, no tolerance bands.
    NamedQuery("p18_hist_quantiles",
      (s, dir) => Sketches.histogramQuantiles(
          Tables.documents(s, dir), "source",
          size(TextOps.tokens(col("text"))).cast("long"),
          width = 16, qs = Seq(0.5, 0.9, 0.99))
        .orderBy("source", "q"),
      Some(histQuantilesOracle)),

    // ---- END-TO-END curation v2 (the p03 composition rebuilt from
    // the round-8/9 operators): frozen MODEL-quality gate (t19) →
    // exact dedup (min-id, exercised by planted replays) → n-gram
    // DECONTAMINATION vs the benchmark slice (d14) → per-source token
    // BUDGET (sw10's batch shape) — one Catalyst plan, per-stage
    // verdict flags for observability, every stage replayed by the
    // composed oracle. The budget stage is the keyed running-sum form
    // (the semantics); p14's histogram-threshold variant is the
    // 100 TB path when a global score order is wanted instead.
    NamedQuery("p19_curation_v2",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
        val bench = docs.filter(col("doc_id") % 10 === 0)
        val corpus0 = docs.filter(col("doc_id") % 10 =!= 0)
        val corpus = corpus0.unionByName(
          corpus0.filter(col("doc_id") % 7 === 1)
            .withColumn("doc_id", col("doc_id") + 1000000))
        val model = graft.ml.QualityModel.scoreFixed(corpus, "doc_id",
            "text", TextOps.langMarkers.head._2)
          .select(col("id").as("doc_id"), col("keep").as("keep_model"))
        val dedup = corpus.withColumn("keep_dedup",
          when(row_number().over(Window.partitionBy(md5(col("text")))
            .orderBy(col("doc_id"))) === 1, 1L).otherwise(0L))
        val contam = Dedup.contaminatedIds(corpus, bench, "doc_id", "text",
            n = DecontamN)
          .select(col("id").as("doc_id"), lit(1L).as("__flag"))
        val staged = dedup.join(model, Seq("doc_id"))
          .join(contam, Seq("doc_id"), "left")
          .withColumn("keep_decontam",
            when(col("__flag").isNull, 1L).otherwise(0L))
          .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
          .withColumn("__sur",
            col("keep_model") * col("keep_dedup") * col("keep_decontam"))
        staged.withColumn("__cum",
            sum(when(col("__sur") === 1, col("n_tokens")).otherwise(0L))
              .over(Window.partitionBy("source").orderBy("doc_id")))
          .withColumn("keep_budget",
            when(col("__sur") === 1 && col("__cum") <= 2000, 1L).otherwise(0L))
          .select("doc_id", "source", "n_tokens", "keep_model", "keep_dedup",
            "keep_decontam", "keep_budget")
          .orderBy("doc_id")
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, source, text FROM documents WHERE doc_id % 10 != 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, source, text FROM documents
             |  WHERE doc_id % 10 != 0 AND doc_id % 7 = 1),
             |${qualityModelCtes("corpus")},
             |model AS (SELECT id AS doc_id,
             |    CASE WHEN round(1.0 / (1.0 + exp(-z)), 4) >= 0.5
             |      THEN 1 ELSE 0 END AS keep_model
             |  FROM z),
             |ded AS (SELECT doc_id, CASE WHEN row_number() OVER (
             |      PARTITION BY md5(text) ORDER BY doc_id) = 1
             |    THEN 1 ELSE 0 END AS keep_dedup
             |  FROM corpus),
             |ctoks AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts FROM corpus),
             |cex AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    generate_series(1, len(ts) - ${DecontamN - 1}),
             |    i -> array_to_string(ts[i:i+${DecontamN - 1}], ' ')))) AS ng
             |  FROM ctoks WHERE len(ts) >= $DecontamN),
             |btoks AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts FROM documents WHERE doc_id % 10 = 0),
             |bgr AS (SELECT DISTINCT unnest(list_distinct(list_transform(
             |    generate_series(1, len(ts) - ${DecontamN - 1}),
             |    i -> array_to_string(ts[i:i+${DecontamN - 1}], ' ')))) AS ng
             |  FROM btoks WHERE len(ts) >= $DecontamN),
             |flagged AS (SELECT DISTINCT cex.doc_id FROM cex JOIN bgr USING (ng)),
             |nt AS (SELECT doc_id, len(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0))::BIGINT AS n_tokens FROM corpus),
             |staged AS (SELECT c.doc_id, c.source, nt.n_tokens,
             |    m.keep_model, d.keep_dedup,
             |    CASE WHEN fl.doc_id IS NULL THEN 1 ELSE 0 END AS keep_decontam
             |  FROM corpus c JOIN model m USING (doc_id)
             |    JOIN ded d USING (doc_id) JOIN nt USING (doc_id)
             |    LEFT JOIN flagged fl USING (doc_id)),
             |s2 AS (SELECT *, keep_model * keep_dedup * keep_decontam AS sur
             |  FROM staged),
             |b AS (SELECT *, sum(CASE WHEN sur = 1 THEN n_tokens ELSE 0 END)
             |    OVER (PARTITION BY source ORDER BY doc_id) AS cum
             |  FROM s2)
             |SELECT doc_id, source, n_tokens,
             |  CAST(keep_model AS BIGINT) AS keep_model,
             |  CAST(keep_dedup AS BIGINT) AS keep_dedup,
             |  CAST(keep_decontam AS BIGINT) AS keep_decontam,
             |  CAST(CASE WHEN sur = 1 AND cum <= 2000 THEN 1 ELSE 0 END
             |    AS BIGINT) AS keep_budget
             |FROM b ORDER BY doc_id""".stripMargin)),

    // ---- pairwise source overlap from the SAME sketches: Jaccard of
    // every two sources estimated in sketch space (|groups|²·k rows,
    // independent of corpus size) — the cross-corpus contamination /
    // provenance audit at 100 TB.
    NamedQuery("p10_source_overlap",
      (s, dir) => Sketches.jaccardOverlap(
          Tables.documents(s, dir), "source", "text", k = KmvK)
        .orderBy("group_a", "group_b"),
      Some(s"""WITH $kmvSketchCtes,
             |p AS (SELECT a.source AS ga, b.source AS gb
             |  FROM (SELECT DISTINCT source FROM sk) a
             |  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
             |u AS (
             |  SELECT p.ga, p.gb, sk.h,
             |    max(CASE WHEN sk.source = p.ga THEN 1 ELSE 0 END) AS in_a,
             |    max(CASE WHEN sk.source = p.gb THEN 1 ELSE 0 END) AS in_b
             |  FROM p JOIN sk ON sk.source = p.ga OR sk.source = p.gb
             |  GROUP BY p.ga, p.gb, sk.h),
             |t AS (SELECT *, row_number() OVER (
             |    PARTITION BY ga, gb ORDER BY h) AS rn FROM u)
             |SELECT ga AS group_a, gb AS group_b,
             |  count(*) AS k_used,
             |  round(CAST(sum(in_a * in_b) AS DOUBLE) / count(*), 6) AS jaccard_est
             |FROM t WHERE rn <= $KmvK GROUP BY ga, gb
             |ORDER BY group_a, group_b""".stripMargin)),

    // ---- MMR diversity selection: 5 rows relevant to the query
    // vector but mutually diverse (λ·rel − (1−λ)·max-sim-to-selected,
    // greedy). The oracle unrolls all 5 greedy steps — each one
    // argmax over the corpus cross-joined with the already-selected
    // rows — so every selection and score is replayed exactly.
    NamedQuery("s09_mmr_diverse_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        // the one-row query-vector fetch is the serving call shape
        val q = emb.filter(col("vec_id") === 0).head()
          .getAs[scala.collection.Seq[Float]]("embedding").toArray
        Similarity.mmrTopK(emb, q, k = 5, lambda = 0.7).orderBy("pos")
      },
      Some(mmrOracle(k = 5, lambda = 0.7))),

    // ---- exact-k deterministic sample per source (fixed-budget
    // sibling of p04's rate-based keep): the 5 smallest-md5 doc ids
    // per stratum via the map-side TopK combine — stable under corpus
    // growth, replayed exactly by the oracle's rank window.
    NamedQuery("p11_fixed_k_sample",
      (s, dir) => Sampling.sampleKPerGroup(
          Tables.documents(s, dir), "source", "doc_id", k = 5)
        .orderBy("source", "sample_rank"),
      Some("""WITH h AS (SELECT source, doc_id,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)
             |      AS h
             |  FROM documents),
             |r AS (SELECT source, doc_id, row_number() OVER (
             |    PARTITION BY source ORDER BY h, doc_id) AS sample_rank FROM h)
             |SELECT source, doc_id, CAST(sample_rank AS INT) AS sample_rank
             |FROM r WHERE sample_rank <= 5
             |ORDER BY source, sample_rank""".stripMargin)),

    // ---- HLL sketch per source + sketch UNION (Datasketches HLL,
    // codegen'd): the mergeable distinct-count artifact a sharded
    // corpus persists per shard and unions at audit time — the
    // binary-sketch sibling of p09's KMV (KMV: exact-replayable
    // bottom-k; HLL: constant-size, union-closed). Estimates checked
    // with the q33 tolerance-bound pattern (exact counts cross-engine,
    // sketch asserted within 5% Spark-side; the union row must bound
    // the GLOBAL distinct, proving the merge).
    NamedQuery("p12_hll_sketch_union",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val per = graft.Caches.cached(docs.groupBy("source")
          .agg(hll_sketch_agg(col("text"), lit(12)).as("sk"),
            countDistinct(col("text")).as("exact")))
        def bounded(est: Column, exact: Column) =
          (abs(est - exact).cast("double") / exact <= 0.05).as("within_5pct")
        val perRow = per.select(col("source"), col("exact"),
          bounded(hll_sketch_estimate(col("sk")), col("exact")))
        val union = per.agg(hll_union_agg(col("sk")).as("sk"))
          .crossJoin(broadcast(
            docs.agg(countDistinct(col("text")).as("exact"))))
          .select(lit("__ALL").as("source"), col("exact"),
            bounded(hll_sketch_estimate(col("sk")), col("exact")))
        perRow.unionByName(union).orderBy("source")
      },
      Some("""SELECT source, count(DISTINCT text) AS exact, TRUE AS within_5pct
             |FROM documents GROUP BY source
             |UNION ALL
             |SELECT '__ALL', count(DISTINCT text), TRUE FROM documents
             |ORDER BY source""".stripMargin)),

    // ---- cross-source duplicate attribution: every 5th doc is
    // mirrored by an 'aggregator' source and every 15th ALSO by a
    // 'scraper' — the audit must count (origin, aggregator) pairs per
    // origin source, the scraper overlaps, and the aggregator×scraper
    // pairs their shared texts induce.
    NamedQuery("d21_cross_source_dups",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text", "source")
        val agg = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
            lit("aggregator").as("source"))
        val scr = docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text"),
            lit("scraper").as("source"))
        Dedup.crossSourceDupAttribution(
            docs.unionByName(agg).unionByName(scr), "doc_id", "text", "source")
          .orderBy("src_lo", "src_hi")
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text, source FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, text, 'aggregator' FROM documents
             |  WHERE doc_id % 5 = 0
             |  UNION ALL
             |  SELECT doc_id + 2000000, text, 'scraper' FROM documents
             |  WHERE doc_id % 15 = 0),
             |t AS (SELECT doc_id AS id, md5(text) AS h, source AS src
             |      FROM all_docs),
             |p AS (SELECT least(a.src, b.src) AS src_lo,
             |             greatest(a.src, b.src) AS src_hi
             |      FROM t a JOIN t b ON a.h = b.h AND a.id < b.id)
             |SELECT src_lo, src_hi, count(*) AS n_pairs
             |FROM p GROUP BY 1, 2 ORDER BY src_lo, src_hi""".stripMargin)),

    // ---- ANN recall audit: per-query recall@5 of the LSH top-k (s02)
    // against the exact top-k (s01) — the monitoring query a serving
    // ANN index runs continuously. The oracle rebuilds BOTH result
    // sets (the s01 and s02 CTEs) and replays the audit join, so a
    // recall regression in either path breaks the hash.
    NamedQuery("s13_ann_recall_audit",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val q = emb.filter(col("vec_id") < 20)
        Similarity.recallAudit(
            Similarity.bruteForceTopK(q, emb, k = 5),
            Similarity.lshCosineTopK(q, emb, k = 5,
              dim = 64, nBits = 32, bands = 8, seed = 42L),
            k = 5)
          .orderBy("query_id")
      },
      Some(s"""WITH ${lshAnnCtes(dim = 64, nBits = 32, bands = 8, seed = 42L)},
             |apx AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
             |bscored AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    round(${dotSql("q.v", "c.v")} / (nq.nm * nc.nm), 6) AS cos
             |  FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
             |  JOIN nrm nq ON q.vec_id = nq.vec_id
             |  JOIN nrm nc ON c.vec_id = nc.vec_id),
             |branked AS (
             |  SELECT query_id, neighbor_id, row_number() OVER (
             |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM bscored),
             |ex AS (SELECT query_id, neighbor_id FROM branked WHERE rank <= 5)
             |SELECT ex.query_id, count(apx.neighbor_id) AS n_hits,
             |  round(count(apx.neighbor_id) / 5.0, 4) AS recall
             |FROM ex LEFT JOIN apx
             |  ON ex.query_id = apx.query_id AND ex.neighbor_id = apx.neighbor_id
             |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin)),

    // ---- IVF probe-count recall sweep (fixed hyperplane centroids —
    // the oracle-replayable path): recall@10 vs brute force for
    // nprobe ∈ {1,2,4,8}. Pins the recall/latency trade-off the IVF
    // default rides on; integer hit counts + one single-division
    // ratio keep the hash engine-stable. The trained-KMeans twin is
    // m14 (rows-only).
    NamedQuery("s14_ivf_probe_sweep",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        Similarity.ivfProbeSweep(emb.filter(col("vec_id") < 20), emb,
            k = 10, dim = 64, nlist = IvfLists, nprobes = Seq(1, 2, 4, 8),
            seed = 7L)
          .orderBy("nprobe")
      },
      Some(ivfProbeSweepOracle(dim = 64, nlist = IvfLists, k = 10,
        nprobes = Seq(1, 2, 4, 8), seed = 7L))),

    // ---- matryoshka truncation audit: recall@10 of brute-force
    // search over only the first {8,16,32} dimensions vs the full
    // 64-dim exact neighbors — the measurement behind truncate-then-
    // rerank storage designs (s10 is the retrieval side). The sliced
    // search is the SAME rounded-cosine brute kernel as s01, so the
    // oracle replays it on list slices.
    NamedQuery("s15_truncated_dim_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        Similarity.truncatedDimSweep(emb.filter(col("vec_id") < 20), emb,
            k = 10, dims = Seq(8, 16, 32))
          .orderBy("dim")
      },
      Some(truncRecallOracle(k = 10, dims = Seq(8, 16, 32)))),

    // ---- Gopher-style rule-flag quality filter: one 0/1 verdict per
    // rule (token band / mean-word-length band / stopword hits) plus
    // the conjunction — the audit view a data mix needs before
    // filtering on `pass`. Bounds chosen to exercise both outcomes of
    // every rule on the synthetic corpus (tokens 10-99, mean length
    // 3.7-5.3, stop hits 0-2). Scan-stage, zero shuffle.
    NamedQuery("t14_quality_rules",
      (s, dir) => TextOps.gopherRules(Tables.documents(s, dir), "doc_id",
          "text", stopwords = enStop, minTokens = 30, maxTokens = 5000,
          minMeanLen = 3.0, maxMeanLen = 4.8, minStopHits = 2)
        .orderBy("id"),
      Some(s"""WITH t AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                             x -> len(x) > 0) AS ts
             |  FROM documents),
             |m AS (SELECT doc_id AS id, len(ts) AS n_tokens,
             |    round(CASE WHEN len(ts) = 0 THEN 0.0
             |      ELSE CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE)
             |        / len(ts) END, 4) AS mean_tok_len,
             |    len(list_intersect(list_distinct(ts), ${sqlList(enStop)}))
             |      AS stop_hits
             |  FROM t),
             |f AS (SELECT id, n_tokens, mean_tok_len, stop_hits,
             |    CASE WHEN n_tokens BETWEEN 30 AND 5000 THEN 1 ELSE 0 END AS len_ok,
             |    CASE WHEN mean_tok_len BETWEEN 3.0 AND 4.8 THEN 1 ELSE 0 END
             |      AS word_len_ok,
             |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS stop_ok
             |  FROM m)
             |SELECT id, CAST(n_tokens AS BIGINT) AS n_tokens, mean_tok_len,
             |  CAST(stop_hits AS BIGINT) AS stop_hits,
             |  CAST(len_ok AS BIGINT) AS len_ok,
             |  CAST(word_len_ok AS BIGINT) AS word_len_ok,
             |  CAST(stop_ok AS BIGINT) AS stop_ok,
             |  CAST(len_ok * word_len_ok * stop_ok AS BIGINT) AS pass
             |FROM f ORDER BY id""".stripMargin)),

    // ---- model-based quality scoring, frozen-weight path: logistic
    // unit over the shared 5-signal feature frame with PUBLISHED
    // weights — the shape a production scorer has once training is
    // frozen, and the deterministic full-oracle twin of m15 (which
    // fits the weights with spark.ml LR instead).
    NamedQuery("t19_quality_model_fixed",
      (s, dir) => graft.ml.QualityModel.scoreFixed(
          Tables.documents(s, dir), "doc_id", "text", enStop)
        .orderBy("id"),
      Some(qualityModelFixedOracle)),

    // ---- per-source score CALIBRATION (t24): the frozen t19 prob
    // mapped to its within-source histogram-CDF percentile — the
    // normalization that makes one keep threshold mean "top X% of
    // EACH source" when score distributions differ by source. Cell
    // aggregate + broadcast-back join; the corpus never windows.
    NamedQuery("t24_score_calibration",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val scored = graft.ml.QualityModel.scoreFixed(docs, "doc_id",
            "text", enStop)
          .join(docs.select(col("doc_id").as("id"), col("source")), "id")
          .select(col("id"), col("source"), col("prob"))
        Sketches.histPercentileCalibration(scored, width = 20)
          .select(col("id"), col("g").as("source"),
            col("score").as("prob"), col("pct"))
          .orderBy("id")
      },
      Some(s"""WITH ${qualityModelCtes("documents")},
             |p AS (SELECT id, round(1.0 / (1.0 + exp(-z)), 4) AS prob FROM z),
             |r AS (SELECT p.id, d.source, prob,
             |    least(CAST(floor(prob * 20) AS INT), 19) AS b
             |  FROM p JOIN documents d ON d.doc_id = p.id),
             |cdf AS (SELECT source, b, count(*) AS cnt FROM r GROUP BY source, b),
             |cdf2 AS (SELECT source, b, cnt,
             |    coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY b
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             |    sum(cnt) OVER (PARTITION BY source) AS total
             |  FROM cdf)
             |SELECT r.id, r.source, r.prob,
             |  round((below + 0.5 * cnt) / total, 6) AS pct
             |FROM r JOIN cdf2 ON r.source = cdf2.source AND r.b = cdf2.b
             |ORDER BY r.id""".stripMargin)),

    // ---- quality-model EVALUATION: confusion of the frozen-weight
    // scorer's keep verdicts against the t14 Gopher-rule labels — the
    // "does the model approximate the rules it bootstraps from"
    // check a quality-classifier deployment ships with. One keyed
    // join of two scan-stage verdict frames + a 1-row aggregate;
    // every cell is an exact integer count.
    NamedQuery("t20_quality_model_confusion", (s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = graft.ml.QualityModel.scoreFixed(docs, "doc_id", "text",
        enStop).select(col("id"), col("keep"))
      val rules = TextOps.gopherRules(docs, "doc_id", "text",
          stopwords = enStop, minTokens = 30, maxTokens = 5000,
          minMeanLen = 3.0, maxMeanLen = 4.8, minStopHits = 2)
        .select(col("id"), col("pass"))
      scored.join(rules, Seq("id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("keep") * col("pass")).as("n_tp"),
          sum(col("keep") * (lit(1L) - col("pass"))).as("n_fp"),
          sum((lit(1L) - col("keep")) * col("pass")).as("n_fn"),
          sum((lit(1L) - col("keep")) * (lit(1L) - col("pass"))).as("n_tn"))
    },
      Some(s"""WITH t AS (
             |  SELECT doc_id, text,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                x -> len(x) > 0) AS ts,
             |    CASE WHEN len(text) = 0 THEN 0.0 ELSE
             |      (len(text) - len(regexp_replace(text, '[.,!?;:''"()\\[\\]{}-]', '', 'g')))::DOUBLE
             |      / len(text) END AS praw
             |  FROM documents),
             |g AS (SELECT doc_id, ts, praw,
             |    list_transform(generate_series(2, len(ts)),
             |                   i -> array_to_string(ts[i-1:i], ' ')) AS g2
             |  FROM t),
             |f AS (SELECT doc_id AS id,
             |    round(least(len(ts)::DOUBLE / 200.0, 1.0), 6) AS f_len,
             |    round(CASE WHEN len(ts) = 0 THEN 0.0 ELSE
             |      len(list_filter(ts, x -> list_contains(${sqlList(enStop)}, x)))::DOUBLE
             |      / len(ts) END, 6) AS f_stop,
             |    round(praw, 6) AS f_punct,
             |    CASE WHEN len(g2) = 0 THEN 0.0
             |      ELSE round(1.0 - len(list_distinct(g2))::DOUBLE / len(g2), 6) END
             |      AS f_dup2,
             |    round(CASE WHEN len(ts) = 0 THEN 0.0 ELSE
             |      CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE)
             |        / len(ts) END / 10.0, 6) AS f_mtl,
             |    len(ts) AS n_tokens,
             |    round(CASE WHEN len(ts) = 0 THEN 0.0
             |      ELSE CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE)
             |        / len(ts) END, 4) AS mean_tok_len,
             |    len(list_intersect(list_distinct(ts), ${sqlList(enStop)}))
             |      AS stop_hits
             |  FROM g),
             |v AS (SELECT id,
             |    CASE WHEN round(1.0 / (1.0 + exp(-(-2.5 + 3.0 * f_len
             |      + 6.0 * f_stop - 8.0 * f_punct - 4.0 * f_dup2
             |      + 2.0 * f_mtl))), 4) >= 0.5 THEN 1 ELSE 0 END AS keep,
             |    CASE WHEN n_tokens BETWEEN 30 AND 5000
             |      AND mean_tok_len BETWEEN 3.0 AND 4.8
             |      AND stop_hits >= 2 THEN 1 ELSE 0 END AS pass
             |  FROM f)
             |SELECT count(*) AS n_docs,
             |  CAST(sum(keep * pass) AS BIGINT) AS n_tp,
             |  CAST(sum(keep * (1 - pass)) AS BIGINT) AS n_fp,
             |  CAST(sum((1 - keep) * pass) AS BIGINT) AS n_fn,
             |  CAST(sum((1 - keep) * (1 - pass)) AS BIGINT) AS n_tn
             |FROM v""".stripMargin)),

    // ---- model-based quality scoring, TRAINED path: spark.ml
    // LogisticRegression fit on t14's Gopher-rule weak labels over the
    // same feature frame, scored back per document. Rows-only at the
    // gate (LBFGS internals aren't SQL); deterministic twin:
    // t19_quality_model_fixed (same features, frozen weights) — and
    // MlSpec pins run-to-run stability + planted-class separation.
    NamedQuery("m15_quality_model_scores",
      (s, dir) => graft.ml.QualityModel.fitScore(
          Tables.documents(s, dir), "doc_id", "text", enStop)
        .orderBy("id"),
      None),

    // ---- vocabulary coverage / OOV rate: per-doc occurrences outside
    // the corpus top-16 vocabulary (31 distinct tokens in the synthetic
    // corpus → a real split; ties in the top-K cut break by token asc,
    // a total order both engines share). Integer columns only.
    NamedQuery("t15_oov_rate",
      (s, dir) => TextOps.oovRate(Tables.documents(s, dir), "doc_id",
          "text", vocabSize = 16)
        .orderBy("id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0)) AS tok
             |  FROM documents),
             |counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
             |vocab AS (SELECT tok FROM counts ORDER BY c DESC, tok LIMIT 16)
             |SELECT doc_id AS id, count(*) AS n_tokens,
             |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_oov
             |FROM toks LEFT JOIN vocab v USING (tok)
             |GROUP BY doc_id ORDER BY id""".stripMargin)),

    // ---- corpus-boilerplate n-gram density: 2-grams in ≥8% of docs
    // are boilerplate (integer threshold math — exact at any corpus
    // size); every 4th doc gets a planted nav-bar phrase so the
    // detector always has a true positive to find regardless of the
    // corpus's natural gram distribution.
    NamedQuery("d20_boilerplate_ngrams",
      (s, dir) => {
        val dirty = Tables.documents(s, dir).select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" subscribe now click here subscribe now")))
          .otherwise(col("text")).as("text"))
        Dedup.boilerplateNgrams(dirty, "doc_id", "text", n = 2, dfPct = 8)
          .orderBy("id")
      },
      Some("""WITH d AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0
             |    THEN text || ' subscribe now click here subscribe now'
             |    ELSE text END AS text FROM documents),
             |t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                                 x -> len(x) > 0) AS ts FROM d),
             |ex AS (SELECT doc_id AS id, unnest(list_transform(
             |    generate_series(1, len(ts) - 1), i -> array_to_string(ts[i:i+1], ' ')))
             |      AS g
             |  FROM t WHERE len(ts) >= 2),
             |n AS (SELECT count(*) AS n_corpus FROM d),
             |b AS (SELECT g FROM (SELECT g, count(DISTINCT id) AS gdf FROM ex GROUP BY g),
             |      n WHERE gdf * 100 >= n_corpus * 8)
             |SELECT id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN g IN (SELECT g FROM b) THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_boiler,
             |  round(sum(CASE WHEN g IN (SELECT g FROM b) THEN 1 ELSE 0 END)
             |    / count(*), 4) AS boiler_ratio
             |FROM ex GROUP BY id ORDER BY id""".stripMargin)),

    // ---- per-document n-gram NOVELTY (cross-document repetition /
    // memorization-risk ranking signal): fraction of each doc's
    // distinct 3-grams that no other document carries. Every 5th doc
    // is replayed (+1000000) so the gate always has planted
    // zero-novelty rows (a replayed doc's every gram is repeated by
    // its original) next to the corpus's organic distribution.
    NamedQuery("t23_ngram_novelty",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val planted = docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
        Dedup.ngramNovelty(docs.unionByName(planted), "doc_id", "text", n = 3)
          .orderBy("id")
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id + 1000000, text FROM documents
             |  WHERE doc_id % 5 = 0),
             |t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                                 x -> len(x) > 0) AS ts FROM all_docs),
             |shs AS (SELECT doc_id, list_distinct(list_transform(
             |    generate_series(1, len(ts) - 2), i -> array_to_string(ts[i:i+2], ' '))) AS arr
             |  FROM t WHERE len(ts) >= 3),
             |ex AS (SELECT doc_id AS id, unnest(arr) AS ng FROM shs),
             |dfc AS (SELECT ng, count(*) AS ndocs FROM ex GROUP BY ng)
             |SELECT id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_repeated,
             |  round(1.0 - CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*), 6) AS novelty_frac
             |FROM ex JOIN dfc USING (ng)
             |GROUP BY id ORDER BY id""".stripMargin)),

    // ---- embedding-norm outlier report (Tukey fences per label):
    // every 97th vector is scaled ×4 (a power of two — float×4 is
    // exact, so both engines see bit-identical planted norms) and must
    // surface as an outlier of its label's rank-based IQR band.
    NamedQuery("s12_norm_outliers",
      (s, dir) => {
        val planted = Tables.embeddings(s, dir).select(col("vec_id"),
          col("label"),
          when(col("vec_id") % 97 === 0,
            transform(col("embedding"), x => x * lit(4.0f)))
          .otherwise(col("embedding")).as("embedding"))
        Similarity.normOutliers(planted, "vec_id", "embedding", "label")
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |    CASE WHEN vec_id % 97 = 0
             |         THEN list_transform(CAST(embedding AS DOUBLE[]), x -> x * 4.0)
             |         ELSE CAST(embedding AS DOUBLE[]) END AS v
             |  FROM embeddings),
             |nm AS (SELECT vec_id, label,
             |    round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS nrm
             |  FROM e),
             |r AS (SELECT vec_id, label, nrm,
             |    row_number() OVER (PARTITION BY label ORDER BY nrm, vec_id) AS rk,
             |    count(*) OVER (PARTITION BY label) AS n
             |  FROM nm),
             |q AS (SELECT label,
             |    max(CASE WHEN rk = ceil(n * 0.25) THEN nrm END) AS q1,
             |    max(CASE WHEN rk = ceil(n * 0.75) THEN nrm END) AS q3
             |  FROM r GROUP BY label),
             |j AS (SELECT r.label, r.vec_id, r.nrm, q.q1, q.q3,
             |    q.q1 - (q.q3 - q.q1) * 1.5 AS lo, q.q3 + (q.q3 - q.q1) * 1.5 AS hi
             |  FROM r JOIN q USING (label))
             |SELECT label, count(*) AS n_vecs, max(q1) AS q1, max(q3) AS q3,
             |  CAST(sum(CASE WHEN nrm < lo OR nrm > hi THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers,
             |  min(CASE WHEN nrm < lo OR nrm > hi THEN vec_id END) AS min_outlier_id
             |FROM j GROUP BY label ORDER BY label""".stripMargin)),

    // ---- BM25 lexical retrieval (s27): top-10 per query under the
    // standard (k1=1.2, b=0.75) scorer — the lexical half of hybrid
    // search and the "mine topical subsets" curation query. Queries
    // are the first 8 tokens of every 125th doc (self excluded), so
    // the gate needs no external query set. The corpus reduces ONCE
    // to a (doc, term, tf) posting table; the query side broadcasts —
    // no corpus×corpus work. Scores round to 6 BEFORE ranking so
    // equal-score ties break on doc_id identically in both engines.
    NamedQuery("s27_bm25_topk",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val qs = docs.filter(col("doc_id") % 125 === 7)
          .select(col("doc_id").as("query_id"),
            concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("qtext"))
        Retrieval.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext",
            k = 10)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH t AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts FROM documents),
             |tf AS (SELECT doc_id, tok, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY 1, 2),
             |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
             |st AS (SELECT count(*) AS n_docs,
             |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
             |q AS (SELECT doc_id AS query_id, unnest(list_distinct(ts[1:8])) AS tok
             |  FROM t WHERE doc_id % 125 = 7),
             |dfq AS (SELECT tok, count(*) AS df FROM tf
             |  WHERE tok IN (SELECT DISTINCT tok FROM q) GROUP BY 1),
             |co AS (SELECT q.query_id, tf.doc_id,
             |    ln(1 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
             |      (tf.tf * (1.2 + 1.0)) /
             |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS w
             |  FROM q JOIN tf USING (tok) JOIN dfq USING (tok)
             |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
             |  WHERE tf.doc_id <> q.query_id),
             |sc AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
             |  FROM co GROUP BY 1, 2),
             |rk AS (SELECT query_id, doc_id, score, row_number() OVER (
             |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM sc)
             |SELECT query_id, doc_id, score, rank FROM rk WHERE rank <= 10
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- hybrid retrieval via reciprocal-rank fusion (s28): BM25
    // top-20 fused with exact-cosine top-20 at RRF c=60 over the
    // common corpus (documents ⋈ embeddings on doc_id = vec_id) — the
    // production hybrid-search shape (lexical catches exact terms the
    // embedding smooths over; dense catches paraphrase the lexicon
    // misses). Both rank lists replay in SQL; the fused score is ONE
    // binary double add (fold-order-proof), rounded before the fused
    // rank.
    NamedQuery("s28_hybrid_rrf",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val corpus = docs.join(emb, col("doc_id") === col("vec_id"))
          .select("doc_id", "text", "embedding")
        val qs = corpus.filter(col("doc_id") % 125 === 7)
        val lex = Retrieval.bm25TopK(corpus.select("doc_id", "text"),
          "doc_id", "text",
          qs.select(col("doc_id").as("query_id"),
            concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("qtext")),
          "query_id", "qtext", k = 20)
        val dense = Similarity.bruteForceTopK(
            qs.select("doc_id", "embedding"),
            corpus.select("doc_id", "embedding"), k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
        Retrieval.rrfFuse(lex.select("query_id", "doc_id", "rank"), dense,
            k = 10)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH c AS (SELECT d.doc_id, d.text, CAST(e.embedding AS DOUBLE[]) AS v
             |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
             |t AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0) AS ts FROM c),
             |tf AS (SELECT doc_id, tok, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY 1, 2),
             |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
             |st AS (SELECT count(*) AS n_docs,
             |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
             |q AS (SELECT doc_id AS query_id, unnest(list_distinct(ts[1:8])) AS tok
             |  FROM t WHERE doc_id % 125 = 7),
             |dfq AS (SELECT tok, count(*) AS df FROM tf
             |  WHERE tok IN (SELECT DISTINCT tok FROM q) GROUP BY 1),
             |co AS (SELECT q.query_id, tf.doc_id,
             |    ln(1 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
             |      (tf.tf * (1.2 + 1.0)) /
             |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS w
             |  FROM q JOIN tf USING (tok) JOIN dfq USING (tok)
             |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
             |  WHERE tf.doc_id <> q.query_id),
             |lsc AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
             |  FROM co GROUP BY 1, 2),
             |lrk AS (SELECT query_id, doc_id, row_number() OVER (
             |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM lsc),
             |lex AS (SELECT query_id, doc_id, rank FROM lrk WHERE rank <= 20),
             |dsc AS (SELECT qc.doc_id AS query_id, cc.doc_id,
             |    round(
             |      list_sum(list_transform(generate_series(1, len(qc.v)), i -> qc.v[i] * cc.v[i])) /
             |      (sqrt(list_sum(list_transform(generate_series(1, len(qc.v)), i -> qc.v[i] * qc.v[i]))) *
             |       sqrt(list_sum(list_transform(generate_series(1, len(cc.v)), i -> cc.v[i] * cc.v[i])))),
             |      6) AS cos
             |  FROM c qc JOIN c cc ON qc.doc_id % 125 = 7 AND qc.doc_id <> cc.doc_id),
             |drk AS (SELECT query_id, doc_id, row_number() OVER (
             |    PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rank FROM dsc),
             |den AS (SELECT query_id, doc_id, rank FROM drk WHERE rank <= 20),
             |f AS (SELECT coalesce(l.query_id, d.query_id) AS query_id,
             |    coalesce(l.doc_id, d.doc_id) AS doc_id,
             |    round(coalesce(1.0 / (60 + l.rank), 0) +
             |          coalesce(1.0 / (60 + d.rank), 0), 6) AS rrf
             |  FROM lex l FULL OUTER JOIN den d
             |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
             |rk AS (SELECT query_id, doc_id, rrf, row_number() OVER (
             |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM f)
             |SELECT query_id, doc_id, rrf, rank FROM rk WHERE rank <= 10
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- PERSISTED BM25 postings index, round-trip serve (s30):
    // the lexical family joins the persisted-index lifecycle — the
    // postings/doclens build is the one corpus-sized keyed shuffle,
    // paid ONCE; every query batch after it is a broadcast probe.
    // Serving s27's query set from the artifact must equal s27's
    // direct form exactly (same scoring plan, postings swapped for
    // the parquet scan) — s27's oracle verbatim.
    NamedQuery("s30_bm25_persisted_serve",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("bm25_idx")
        Retrieval.writePostingsIndex(docs, "doc_id", "text", path)
        Retrieval.bm25TopKFromIndex(s, path, bm25Queries(docs),
            "query_id", "qtext", k = 10)
          .orderBy("query_id", "rank")
      },
      Some(bm25IndexOracle())),

    // ---- BM25 index incremental APPEND (s31): build on the even
    // half, append the odd half (posting rows are per-doc independent
    // — two plain parquet appends, no rewrite, no read of the
    // existing artifact), then serve: must equal the full one-shot
    // build — s27's oracle verbatim. The production ingest loop for
    // the lexical index.
    NamedQuery("s31_bm25_index_append",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("bm25_idx_grow")
        Retrieval.writePostingsIndex(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
        Retrieval.appendToPostingsIndex(
          docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", path)
        Retrieval.bm25TopKFromIndex(s, path, bm25Queries(docs),
            "query_id", "qtext", k = 10)
          .orderBy("query_id", "rank")
      },
      Some(bm25IndexOracle())),

    // ---- BM25 index DELETES: tombstones + compaction (s32) — the
    // lexical sibling of d32/s29, completing opt-out coverage on the
    // last index family. Deletes (every 5th doc) land doc_id-keyed in
    // the tombstone side-table; the serve anti-joins BOTH artifacts
    // AND derives df/n_docs/avgdl from the live view, so phase 1
    // (tombstoned) and phase 2 (post-compaction) must both equal a
    // rebuild from the retained corpus — the oracle scores the
    // filtered corpus and emits it under both phase tags. Query texts
    // still derive from the FULL corpus (a deleted doc's text remains
    // a perfectly good external query).
    NamedQuery("s32_bm25_tombstone_compaction",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("bm25_idx_ts")
        Retrieval.writePostingsIndex(docs, "doc_id", "text", path)
        Retrieval.tombstonePostingsIndex(
          docs.filter(col("doc_id") % 5 === 0).select("doc_id"),
          "doc_id", path)
        // the query texts are a pure function of the FULL corpus —
        // identical in both phases — so derive them once (one corpus
        // scan + tokenize, not one per serve; guide §2.4). The serves
        // themselves stay separate: each re-reads its own artifact
        // state, which is exactly what the phase proof pins.
        val qs = graft.Caches.cached(bm25Queries(docs))
        def serve(tag: Int) =
          Retrieval.bm25TopKFromIndex(s, path, qs,
              "query_id", "qtext", k = 10)
            .select(lit(tag).as("phase"), col("query_id"), col("doc_id"),
              col("score"), col("rank"))
        val p1 = serve(1).localCheckpoint()
        Retrieval.compactPostingsIndex(s, path)
        val p2 = serve(2)
        p1.unionByName(p2).orderBy("phase", "query_id", "rank")
      },
      Some(bm25IndexOracle(corpusFilter = "doc_id % 5 <> 0",
        phases = 2))),

    // ---- hybrid RRF over the PERSISTED serving pair (s33): the
    // deployed hybrid-search shape — BM25 from the postings artifact
    // (s30) fused with the persisted IVF-PQ serve (s19 mechanics),
    // dense side metadata-filtered to ids with a documents row (s26's
    // filtered-candidate serve over ONE shared index). s28 keeps the
    // exact-cosine fusion as the audit baseline; THIS is what
    // production serves, and the oracle chains the bm25 CTEs + s18's
    // probe/ADC CTEs + the RRF arithmetic, so the fused list
    // hash-matches end to end.
    NamedQuery("s33_hybrid_rrf_persisted",
      (s, dir) => sharedHybridFused(s, dir).orderBy("query_id", "rank"),
      Some(hybridPersistedOracle(fused = true))),

    // ---- hybrid rank-overlap AUDIT (s34): per query, how much of
    // s33's persisted-fused top-10 survives in the EXACT-fused top-10
    // (same postings lex side; dense side exact cosine over the
    // common corpus — s28's audit shape)? The monitoring query a
    // deployment runs continuously: a drop says the compressed dense
    // side is drifting from exact before users notice. Both fused
    // lists and the overlap replay in the oracle, so the audit
    // numbers themselves hash-match (the m16 recall-audit pattern).
    NamedQuery("s34_hybrid_overlap_audit",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val lex = Retrieval.bm25TopKFromIndex(s, sharedBm25Path(s, dir),
            bm25Queries(docs), "query_id", "qtext", k = 20)
          .select("query_id", "doc_id", "rank")
        val common = emb.join(
          broadcast(docs.select(col("doc_id").as("vec_id"))), Seq("vec_id"))
        val qemb = common.filter(col("vec_id") % 125 === 7)
        val denseExact = Similarity.bruteForceTopK(
            qemb.select("vec_id", "embedding"),
            common.select("vec_id", "embedding"), k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
        val fusedP = sharedHybridFused(s, dir)
        val fusedE = Retrieval.rrfFuse(lex, denseExact, k = 10)
        val overlap = fusedP.select("query_id", "doc_id")
          .join(fusedE.select("query_id", "doc_id"), Seq("query_id", "doc_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
        qemb.select(col("vec_id").as("query_id")).distinct()
          .join(overlap, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
          .withColumn("overlap_frac", round(col("n_overlap") / 10.0, 2))
          .orderBy("query_id")
      },
      Some(hybridPersistedOracle(fused = false))),

    // ---- RAG context packing over the persisted hybrid pair (s35):
    // the serving step AFTER retrieval — walk each query's fused
    // ranked list in order and admit documents while the running
    // token total stays within the context budget (greedy prefix, the
    // standard context-assembly rule). Token counts come from the
    // postings artifact's own doclens — the serving stack reuses its
    // index metadata instead of re-tokenizing, so packing is a
    // broadcast-sized join + per-query window over ≤10 rows. Oracle
    // chains the s33 CTE stack + the running-sum walk.
    NamedQuery("s35_rag_context_pack",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val fused = sharedHybridFused(s, dir)
        val w = Window.partitionBy("query_id").orderBy("rank")
        fused.join(Retrieval.liveDoclens(s, sharedBm25Path(s, dir)),
            Seq("doc_id"))
          .withColumn("cum_tokens", sum("dl").over(w))
          .filter(col("cum_tokens") <= RagBudget)
          .select(col("query_id"), col("doc_id"), col("rank"),
            col("dl").as("n_tokens"), col("cum_tokens"))
          .orderBy("query_id", "rank")
      },
      Some(ragPackOracle(RagBudget))),

    // ---- hard-negative mining (s36): the retrieval-model training-
    // data op — for every query, the top BM25 hits from the persisted
    // postings artifact that are NOT positives become the training
    // negatives ("hard" because the retriever itself ranked them
    // high). Positives here are same-SOURCE docs (the leakage-safe
    // rule: a near-positive mined as a negative poisons the loss), so
    // the top-20 candidate list is re-ranked after dropping them and
    // the top-5 emit per query. Scale shape: the candidate list is
    // queries×k rows; BOTH source lookups broadcast it against the
    // documents scan (the corpus never shuffles), and the re-rank
    // window sees ≤20 rows per query.
    NamedQuery("s36_hard_negative_mining",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val cand = Retrieval.bm25TopKFromIndex(s, sharedBm25Path(s, dir),
          bm25Queries(docs.select("doc_id", "text")), "query_id", "qtext",
          k = 20)
        val withQ = docs
          .select(col("doc_id").as("query_id"), col("source").as("__qs"))
          .join(broadcast(cand), Seq("query_id"))
        val neg = docs.select(col("doc_id"), col("source").as("__ds"))
          .join(broadcast(withQ), Seq("doc_id"))
          .filter(col("__qs") =!= col("__ds"))
        val w = Window.partitionBy("query_id").orderBy("rank")
        neg.withColumn("neg_rank", row_number().over(w).cast("int"))
          .filter(col("neg_rank") <= 5)
          .select("query_id", "neg_rank", "doc_id", "score")
          .orderBy("query_id", "neg_rank")
      },
      Some(s"""WITH ${bm25Ctes(qn = "q")},
         |cand AS (SELECT query_id, doc_id, score, rank FROM qrk
         |  WHERE rank <= 20),
         |neg AS (SELECT c.query_id, c.doc_id, c.score, c.rank
         |  FROM cand c
         |  JOIN documents qd ON qd.doc_id = c.query_id
         |  JOIN documents dd ON dd.doc_id = c.doc_id
         |  WHERE qd.source <> dd.source),
         |rr AS (SELECT query_id, doc_id, score, row_number() OVER (
         |    PARTITION BY query_id ORDER BY rank) AS neg_rank FROM neg)
         |SELECT query_id, CAST(neg_rank AS INT) AS neg_rank, doc_id, score
         |FROM rr WHERE neg_rank <= 5
         |ORDER BY query_id, neg_rank""".stripMargin)),

    // ---- contrastive TRIPLETS (s37): the complete
    // (anchor, positive, negative) example constructor for
    // triplet/InfoNCE retriever training, composed from the same
    // persisted-postings candidate list as s36 — positive = the
    // best-ranked SAME-source candidate (the leakage-safe positive
    // rule: relevance by provenance, never by the score being
    // learned), negatives = s36's top-5 different-source hits.
    // Queries missing either side emit nothing (a triplet needs
    // both). Scale shape: the candidate list is queries×k rows,
    // broadcast against the corpus scan for both source lookups; the
    // pos/neg windows see ≤20 rows per query and the final pos×neg
    // join is query-keyed — the corpus never shuffles.
    NamedQuery("s37_contrastive_triplets",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val cand = Retrieval.bm25TopKFromIndex(s, sharedBm25Path(s, dir),
          bm25Queries(docs.select("doc_id", "text")), "query_id", "qtext",
          k = 20)
        val withQ = docs
          .select(col("doc_id").as("query_id"), col("source").as("__qs"))
          .join(broadcast(cand), Seq("query_id"))
        val lab = docs.select(col("doc_id"), col("source").as("__ds"))
          .join(broadcast(withQ), Seq("doc_id"))
        val w = Window.partitionBy("query_id").orderBy("rank")
        val pos = lab.filter(col("__qs") === col("__ds"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("query_id"), col("doc_id").as("pos_doc_id"),
            col("score").as("pos_score"))
        val neg = lab.filter(col("__qs") =!= col("__ds"))
          .withColumn("neg_rank", row_number().over(w).cast("int"))
          .filter(col("neg_rank") <= 5)
          .select(col("query_id"), col("neg_rank"),
            col("doc_id").as("neg_doc_id"), col("score").as("neg_score"))
        pos.join(neg, Seq("query_id"))
          .select("query_id", "pos_doc_id", "pos_score", "neg_rank",
            "neg_doc_id", "neg_score")
          .orderBy("query_id", "neg_rank")
      },
      Some(s"""WITH ${bm25Ctes(qn = "q")},
         |cand AS (SELECT query_id, doc_id, score, rank FROM qrk
         |  WHERE rank <= 20),
         |lab AS (SELECT c.query_id, c.doc_id, c.score, c.rank,
         |    qd.source AS qs, dd.source AS ds
         |  FROM cand c
         |  JOIN documents qd ON qd.doc_id = c.query_id
         |  JOIN documents dd ON dd.doc_id = c.doc_id),
         |pos AS (SELECT query_id, doc_id AS pos_doc_id,
         |    score AS pos_score
         |  FROM (SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY rank) AS rn
         |    FROM lab WHERE qs = ds) WHERE rn = 1),
         |neg AS (SELECT query_id, doc_id AS neg_doc_id,
         |    score AS neg_score, row_number() OVER (
         |      PARTITION BY query_id ORDER BY rank) AS neg_rank
         |  FROM lab WHERE qs <> ds)
         |SELECT p.query_id, p.pos_doc_id, p.pos_score,
         |  CAST(n.neg_rank AS INT) AS neg_rank, n.neg_doc_id, n.neg_score
         |FROM pos p JOIN neg n USING (query_id)
         |WHERE n.neg_rank <= 5
         |ORDER BY p.query_id, n.neg_rank""".stripMargin)),

    // ---- BOUNDED-batch contrastive triplets (s39): s37's serve with
    // the production cap — a triplet-mining run never serves the whole
    // query backlog in one batch; it takes the next `TripletBatchCap`
    // queries (smallest pending ids here, so the batch is
    // deterministic) and bounds the expensive queries×postings
    // retrieval to cap×postings REGARDLESS of how many queries the
    // corpus implies. The cap of 3 binds at sf0.01's 4-query backlog
    // (and everywhere above), so the oracle proves the capped
    // semantics, not a no-op. Scale shape: candidate work ∝ cap×postings (grows only
    // with the index, never with the query backlog) — this replaces
    // s37's 46× queries×corpus profile at 100× with an index-bounded
    // one. The cap select itself is a TakeOrderedAndProject over the
    // 1/125 query frame: tiny, then broadcast.
    NamedQuery("s39_bounded_triplet_batch",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val batch = bm25Queries(docs.select("doc_id", "text"))
          .orderBy("query_id").limit(TripletBatchCap)
        val cand = Retrieval.bm25TopKFromIndex(s, sharedBm25Path(s, dir),
          batch, "query_id", "qtext", k = 20)
        val withQ = docs
          .select(col("doc_id").as("query_id"), col("source").as("__qs"))
          .join(broadcast(cand), Seq("query_id"))
        val lab = docs.select(col("doc_id"), col("source").as("__ds"))
          .join(broadcast(withQ), Seq("doc_id"))
        val w = Window.partitionBy("query_id").orderBy("rank")
        val pos = lab.filter(col("__qs") === col("__ds"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("query_id"), col("doc_id").as("pos_doc_id"),
            col("score").as("pos_score"))
        val neg = lab.filter(col("__qs") =!= col("__ds"))
          .withColumn("neg_rank", row_number().over(w).cast("int"))
          .filter(col("neg_rank") <= 5)
          .select(col("query_id"), col("neg_rank"),
            col("doc_id").as("neg_doc_id"), col("score").as("neg_score"))
        pos.join(neg, Seq("query_id"))
          .select("query_id", "pos_doc_id", "pos_score", "neg_rank",
            "neg_doc_id", "neg_score")
          .orderBy("query_id", "neg_rank")
      },
      Some(s"""WITH ${bm25Ctes(qn = "q", queryCap = TripletBatchCap)},
         |cand AS (SELECT query_id, doc_id, score, rank FROM qrk
         |  WHERE rank <= 20),
         |lab AS (SELECT c.query_id, c.doc_id, c.score, c.rank,
         |    qd.source AS qs, dd.source AS ds
         |  FROM cand c
         |  JOIN documents qd ON qd.doc_id = c.query_id
         |  JOIN documents dd ON dd.doc_id = c.doc_id),
         |pos AS (SELECT query_id, doc_id AS pos_doc_id,
         |    score AS pos_score
         |  FROM (SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY rank) AS rn
         |    FROM lab WHERE qs = ds) WHERE rn = 1),
         |neg AS (SELECT query_id, doc_id AS neg_doc_id,
         |    score AS neg_score, row_number() OVER (
         |      PARTITION BY query_id ORDER BY rank) AS neg_rank
         |  FROM lab WHERE qs <> ds)
         |SELECT p.query_id, p.pos_doc_id, p.pos_score,
         |  CAST(n.neg_rank AS INT) AS neg_rank, n.neg_doc_id, n.neg_score
         |FROM pos p JOIN neg n USING (query_id)
         |WHERE n.neg_rank <= 5
         |ORDER BY p.query_id, n.neg_rank""".stripMargin)),

    // ---- weighted reservoir sample (p24): k=5 docs per source,
    // selection probability ∝ n_chars, WITHOUT replacement —
    // Efraimidis–Spirakis A-ES on a content-hash-derived u, so the
    // draw is reproducible across engines/runs/partitionings (no
    // RNG). Runs in the TopK aggregator: map-side combine ships k
    // candidates per source per partition — no window, no sort.
    NamedQuery("p24_weighted_reservoir",
      (s, dir) => Sampling.weightedReservoir(
          Tables.documents(s, dir), "source", "doc_id",
          col("n_chars"), k = 5)
        .orderBy("source", "sample_rank"),
      Some("""WITH k AS (SELECT source, doc_id,
             |    -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)
             |         + 1.0) / 4503599627370497.0)
             |      / CAST(n_chars AS DOUBLE) AS key
             |  FROM documents),
             |r AS (SELECT source, doc_id, key, row_number() OVER (
             |    PARTITION BY source ORDER BY key, doc_id) AS sample_rank FROM k)
             |SELECT source, doc_id, round(key, 9) AS res_key,
             |  CAST(sample_rank AS INT) AS sample_rank
             |FROM r WHERE sample_rank <= 5
             |ORDER BY source, sample_rank""".stripMargin)),

    // ---- persisted-index DELETES: tombstones + compaction (d32) —
    // the opt-out/takedown shape no 100 TB index escapes. Deletes
    // land as an append-only tombstone side-table the serve path
    // anti-joins (index files untouched); compaction folds them in
    // and clears the side-table. TWO serve phases make the oracle pin
    // every contract at once: phase 1 (tombstoned serve) must ADMIT
    // re-submissions of deleted content (+1e6 — the opt-out forgets),
    // must still REJECT retained-content replays (+2e6 — no
    // over-delete); phase 2 (post-compaction serve) must REJECT
    // replays of phase-1 admissions (+3e6 — appended rows survive the
    // rewrite) and of the re-admitted deleted content (+4e6).
    NamedQuery("d32_index_tombstone_compaction",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("hash_idx_ts")
        Dedup.writeHashIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", path)
        Dedup.tombstoneHashIndex(
          docs.filter(col("doc_id") % 6 === 0), "text", path)
        val b1 = docs.filter(col("doc_id") % 4 === 1)
          .unionByName(docs.filter(col("doc_id") % 6 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000))
          .unionByName(docs.filter(col("doc_id") % 4 === 2 && col("doc_id") % 6 =!= 0)
            .withColumn("doc_id", col("doc_id") + 2000000))
        val a1 = Dedup.ingestAgainstLiveHashIndex(b1, "doc_id", "text", path)
          .select(lit(1).as("phase"), col("doc_id"))
        Dedup.compactHashIndex(s, path)
        val b2 = docs.filter(col("doc_id") % 4 === 3)
          .unionByName(docs.filter(col("doc_id") % 4 === 1)
            .withColumn("doc_id", col("doc_id") + 3000000))
          .unionByName(docs.filter(col("doc_id") % 6 === 0)
            .withColumn("doc_id", col("doc_id") + 4000000))
        val a2 = Dedup.ingestAgainstLiveHashIndex(b2, "doc_id", "text", path)
          .select(lit(2).as("phase"), col("doc_id"))
        a1.unionByName(a2).orderBy("phase", "doc_id")
      },
      Some("""WITH idx0 AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
             |del AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 6 = 0),
             |live0 AS (SELECT h FROM idx0 WHERE h NOT IN (SELECT h FROM del)),
             |b1 AS (
             |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 4 = 1
             |  UNION ALL SELECT doc_id + 1000000, md5(text) FROM documents
             |    WHERE doc_id % 6 = 0
             |  UNION ALL SELECT doc_id + 2000000, md5(text) FROM documents
             |    WHERE doc_id % 4 = 2 AND doc_id % 6 <> 0),
             |a1 AS (SELECT doc_id, h FROM (SELECT doc_id, h, row_number() OVER (
             |    PARTITION BY h ORDER BY doc_id) AS rn FROM b1)
             |  WHERE rn = 1 AND h NOT IN (SELECT h FROM live0)),
             |live1 AS (SELECT h FROM live0 UNION SELECT h FROM a1),
             |b2 AS (
             |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 4 = 3
             |  UNION ALL SELECT doc_id + 3000000, md5(text) FROM documents
             |    WHERE doc_id % 4 = 1
             |  UNION ALL SELECT doc_id + 4000000, md5(text) FROM documents
             |    WHERE doc_id % 6 = 0),
             |a2 AS (SELECT doc_id, h FROM (SELECT doc_id, h, row_number() OVER (
             |    PARTITION BY h ORDER BY doc_id) AS rn FROM b2)
             |  WHERE rn = 1 AND h NOT IN (SELECT h FROM live1))
             |SELECT 1 AS phase, doc_id FROM a1
             |UNION ALL SELECT 2, doc_id FROM a2
             |ORDER BY phase, doc_id""".stripMargin)),

    // ---- NEAR-DUP index deletes: tombstones + compaction (d33) —
    // d32's MinHash sibling; with it every persisted admission gate
    // (exact hash, lexical near-dup, semantic IVF) has the full
    // lifecycle incl. DELETE. A tombstoned doc stops vetoing its
    // near-duplicates: band rows AND signature rows anti-join the
    // delete side-table. Phase 1 (tombstoned serve) must ADMIT
    // replays of deleted contents (+1e6), REJECT retained-content
    // replays (+2e6), and pass fresh odds through both gates; phase 2
    // re-ingests the IDENTICAL feed after compaction and must admit
    // no SIGNABLE doc (phase-1 appends survived the rewrite;
    // re-admitted deleted content is indexed again) — idempotent
    // re-ingest, the exactly-once guarantee a production delete
    // pipeline needs. Unsignable (< n token) docs re-admit every
    // phase by contract; the oracle emits them under phase 2 too.
    NamedQuery("d33_neardup_tombstone_compaction",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val path = graft.ScratchDirs.scratch("mh_idx_ts")
        Dedup.writeMinhashIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", n = 3, numHashes = MhHashes, bands = MhBands, path)
        Dedup.tombstoneMinhashIndex(
          docs.filter(col("doc_id") % 6 === 0).select("doc_id"),
          "doc_id", path)
        // both phases ingest the IDENTICAL feed — materialize it once,
        // and PREPARE the batch side once: the feed's signature table
        // and within-batch drop set are pure functions of the feed
        // (independent of index state), so phase 2 pays the index
        // probe/verify/append — the proof — not a second
        // tokenize+shingle+minhash pass or banded self-join
        // (guide §2.4; the s38 one-postings-build precedent).
        val feed = graft.Caches.cached(
          docs.filter(col("doc_id") % 4 === 1)
            .unionByName(docs.filter(col("doc_id") % 6 === 0)
              .withColumn("doc_id", col("doc_id") + 1000000))
            .unionByName(docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 6 =!= 0)
              .withColumn("doc_id", col("doc_id") + 2000000)))
        val prepared = Dedup.prepareMinhashBatch(feed, "doc_id", "text",
          n = 3, numHashes = MhHashes, bands = MhBands, minJaccard = 0.5)
        def serve(tag: Int) =
          Dedup.ingestAgainstLiveMinhashIndexPrepared(feed, "doc_id", path,
              numHashes = MhHashes, bands = MhBands, minJaccard = 0.5,
              prepared = prepared)
            .select(lit(tag).as("phase"), col("doc_id"))
        val p1 = serve(1).localCheckpoint()
        Dedup.compactMinhashIndex(s, path)
        val p2 = serve(2)
        p1.unionByName(p2).orderBy("phase", "doc_id")
      },
      Some(minhashTombstoneOracle(MhHashes, MhBands, 0.5))),

    // ---- per-epoch deterministic reshuffle (p25): the training-loop
    // contract that each epoch visits every doc exactly once in a
    // fresh order, as a pure function of (epoch, id) — resume-safe,
    // engine-portable, no RNG. ONE scan emits all epochs (the epoch
    // list explodes scan-stage); the shard hash covers (epoch, id) so
    // shard MEMBERSHIP reshuffles too; the only shuffle is the
    // (epoch, shard)-keyed window. SamplingSpec pins the permutation
    // properties; the gate pins the exact orders.
    NamedQuery("p25_epoch_reshuffle",
      (s, dir) => Sampling.epochShuffle(Tables.documents(s, dir),
          "doc_id", nShards = 4, epochs = 2)
        .orderBy("epoch", "shard", "pos"),
      Some("""WITH x AS (SELECT doc_id, e.epoch FROM documents
             |  CROSS JOIN (SELECT 0 AS epoch UNION ALL SELECT 1 AS epoch) e),
             |h AS (SELECT epoch, doc_id,
             |    md5(CAST(epoch AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)) AS hx
             |  FROM x),
             |sh AS (SELECT epoch, doc_id, hx,
             |    CAST(CAST('0x' || substr(hx, 1, 8) AS BIGINT) % 4 AS INT) AS shard
             |  FROM h)
             |SELECT epoch, shard,
             |  CAST(row_number() OVER (
             |    PARTITION BY epoch, shard ORDER BY hx, doc_id) AS INT) AS pos,
             |  doc_id
             |FROM sh ORDER BY epoch, shard, pos""".stripMargin)),

    // ---- per-user behavioral training sequences (p26): each user's
    // event log ordered by (ts, event_id), cut into sliding windows of
    // 8 events every 4 — the sequence-model training-example feed
    // (next-event prediction). Only full windows emit; the oracle
    // replays the rank → window-membership fan-out and the ordered
    // string_agg, so the exact example strings hash-match.
    NamedQuery("p26_user_history_sequences",
      (s, dir) => Sampling.historySequences(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", seqLen = 8, stride = 4)
        .orderBy("user_id", "seq_idx"),
      Some("""WITH r AS (SELECT user_id, event_type, row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |e AS (SELECT user_id, event_type, rn,
             |    unnest(generate_series(
             |      CAST(greatest(0, ceil((rn - 8) / 4.0)) AS BIGINT),
             |      CAST(floor((rn - 1) / 4.0) AS BIGINT))) AS seq_idx
             |  FROM r),
             |g AS (SELECT user_id, seq_idx, count(*) AS n,
             |    string_agg(event_type, ' ' ORDER BY rn) AS seq
             |  FROM e GROUP BY 1, 2)
             |SELECT user_id, CAST(seq_idx AS INT) AS seq_idx, seq
             |FROM g WHERE n = 8 ORDER BY user_id, seq_idx""".stripMargin)),

    // ---- DSIR importance selection (p27): pick the 100 non-English
    // docs whose hashed-unigram distribution is most English-like —
    // the published importance-resampling recipe (target LM / raw LM
    // log-ratio over B=1024 md5-hashed buckets, add-one smoothing,
    // Gumbel-top-k draw keyed by the content hash so the "randomness"
    // is reproducible). The oracle replays bucket stats, both
    // smoothed LMs, the per-doc log-weight sum, and the Gumbel keys.
    NamedQuery("p27_dsir_importance_select",
      (s, dir) => Sampling.dsirSelect(Tables.documents(s, dir),
          "doc_id", "text", col("lang") === "en", nBuckets = 1024, k = 100)
        .withColumnRenamed("id", "doc_id")
        .orderBy("sel_rank"),
      Some("""WITH toks AS (
             |  SELECT doc_id AS id, lang = 'en' AS t, unnest(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> len(x) > 0)) AS tok
             |  FROM documents),
             |tb AS (SELECT id, t,
             |    CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) % 1024 AS b
             |  FROM toks),
             |cnt AS (SELECT b,
             |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
             |    sum(CASE WHEN t THEN 0 ELSE 1 END) AS rc
             |  FROM tb GROUP BY b),
             |tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM cnt),
             |lw AS (SELECT b,
             |    ln((tc + 1.0) / (tt + 1024)) - ln((rc + 1.0) / (rt + 1024))
             |      AS lw
             |  FROM cnt CROSS JOIN tot),
             |sc AS (SELECT id, sum(lw) AS logw
             |  FROM tb JOIN lw USING (b) WHERE NOT t GROUP BY id),
             |g AS (SELECT id, logw, logw - ln(-ln(
             |    (CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 13) AS BIGINT)
             |     + 1.0) / 4503599627370497.0)) AS key
             |  FROM sc),
             |rk AS (SELECT id, logw, key, row_number() OVER (
             |    ORDER BY key DESC, id) AS sel_rank FROM g)
             |SELECT id AS doc_id, round(logw, 6) AS logw,
             |  round(key, 6) AS gumbel_key, CAST(sel_rank AS INT) AS sel_rank
             |FROM rk WHERE sel_rank <= 100 ORDER BY sel_rank""".stripMargin)),

    // ---- DSIR LM as a persisted serving artifact (p28): train the
    // bucket log-ratio LM once (writeDsirLm — observed buckets + a
    // self-contained unseen-bucket default), then score the WHOLE
    // corpus from the frozen file through ONE constant-folded LUT
    // expression — no explode, no join, no aggregation; the t19
    // frozen-scorer lifecycle applied to the data-selection LM. The
    // oracle recomputes the LM and every per-doc sum from scratch, so
    // the artifact round-trip must equal a from-raw rebuild exactly.
    NamedQuery("p28_dsir_lm_serve",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val path = graft.ScratchDirs.scratch("dsir_lm")
        Sampling.writeDsirLm(docs, "text",
          col("lang") === "en", nBuckets = 1024, path)
        val (lut, n) = Sampling.readDsirLut(s, path)
        docs.select(col("doc_id"),
            round(Sampling.dsirScore(lut, n, col("text")), 6).as("score"))
          .orderBy("doc_id")
      },
      Some(dsirScoreOracle(
        "SELECT doc_id, score FROM scored ORDER BY doc_id"))),

    // ---- DSIR LM incremental APPEND (p29): train on the even half,
    // append the odd half (bucket counts are additive — one
    // ≤nBuckets-row parquet append, no rewrite, no read of the
    // existing artifact), then serve the whole corpus: must equal the
    // full one-shot train — p28's oracle verbatim. The production
    // "refresh the selection LM as corpora grow" loop, completing
    // {build, append, serve} × {batch, stream} for the LM family.
    NamedQuery("p29_dsir_lm_append",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val path = graft.ScratchDirs.scratch("dsir_lm_grow")
        Sampling.writeDsirLm(docs.filter(col("doc_id") % 2 === 0), "text",
          col("lang") === "en", nBuckets = 1024, path)
        Sampling.appendDsirLm(docs.filter(col("doc_id") % 2 =!= 0), "text",
          col("lang") === "en", path)
        val (lut, n) = Sampling.readDsirLut(s, path)
        docs.select(col("doc_id"),
            round(Sampling.dsirScore(lut, n, col("text")), 6).as("score"))
          .orderBy("doc_id")
      },
      Some(dsirScoreOracle(
        "SELECT doc_id, score FROM scored ORDER BY doc_id"))),

    // ---- repeat-capped budget water-filling (p30): the
    // data-constrained scaling allocation — a char budget splits
    // across sources proportionally to integer mixture weights
    // (derived here from the source id, 1/11/21/31/41), but no
    // source may supply more than 4 epochs of its unique mass.
    // Saturation is decided by exact integer cross-multiplication in
    // cap/weight-rate order (a running-min window encodes the
    // water-filling prefix property); only the sort rate and the two
    // outputs are floating. Every window runs in source space.
    NamedQuery("p30_epoch_budget_allocation",
      (s, dir) => Sampling.epochBudgetAllocation(
          Tables.documents(s, dir), "source", col("n_chars"),
          lit(1) + lit(10) *
            (expr("CAST(substring(source, 4, 10) AS INT)") % 5),
          budget = 300000L, maxEpochs = 4)
        .orderBy("source"),
      Some("""WITH per AS (SELECT source,
             |    CAST(sum(n_chars) AS BIGINT) AS uniq,
             |    CAST(1 + 10 * (CAST(substr(source, 4) AS INT) % 5) AS BIGINT)
             |      AS weight,
             |    CAST(4 * sum(n_chars) AS BIGINT) AS cap
             |  FROM documents GROUP BY source),
             |o AS (SELECT *, cap::DOUBLE / weight AS r FROM per),
             |t AS (SELECT *,
             |    coalesce(sum(cap) OVER (ORDER BY r, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS cap_pre,
             |    sum(weight) OVER (ORDER BY r, source
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS w_suf
             |  FROM o),
             |f AS (SELECT *, CASE WHEN cap * w_suf <=
             |      (300000 - cap_pre) * weight THEN 1 ELSE 0 END AS flag
             |  FROM t),
             |g AS (SELECT *, min(flag) OVER (ORDER BY r, source
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS saturated FROM f),
             |h AS (SELECT *, sum(cap * saturated) OVER () AS sat_cap,
             |    sum(weight * (1 - saturated)) OVER () AS unsat_w FROM g),
             |i AS (SELECT *, round(CASE WHEN saturated = 1 THEN cap::DOUBLE
             |    ELSE ((300000 - sat_cap) * weight)::DOUBLE / unsat_w END, 2)
             |    AS allocated FROM h)
             |SELECT source, uniq, weight, cap,
             |  CAST(saturated AS BIGINT) AS saturated, allocated,
             |  round(allocated / uniq, 4) AS epochs
             |FROM i ORDER BY source""".stripMargin)),

    // ---- DoReMi-style domain reweighting (p31): the iterative
    // mixture-weight solve over a REAL per-domain loss — each
    // source's mean unigram surprisal (t06's arithmetic per source)
    // — with a Muennighoff repetition penalty halving a domain's
    // pull per epoch its current weight would force. Four
    // multiplicative-weight rounds, 6-dp re-rounding per round keeps
    // both engines in lockstep; all iteration runs in source space
    // (the corpus pays one tokenize + frequency join).
    NamedQuery("p31_domain_reweight",
      (s, dir) => Sampling.domainReweight(
          Tables.documents(s, dir), "source", "text",
          eta = 0.1, rounds = 4)
        .orderBy("source"),
      Some(domainReweightOracle("0.1", 4))),

    // ---- mixture MATERIALIZATION (p32): the apply step after the
    // p31 solve — w_final becomes per-source keep rates
    // min(1, budget·w/tokens_s), decided by the p04/p20 content-hash
    // rule, so the solved mixture turns into an actual training set
    // with no corpus shuffle (broadcast thresholds + scan-stage hash
    // filter). Realized per-source doc/token totals are the gate;
    // the oracle chains the full p31 CTE stack into the p20
    // threshold/keep arithmetic.
    NamedQuery("p32_mix_materialize",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = Sampling.domainReweight(docs, "source", "text",
            eta = 0.1, rounds = 4)
          .select(col("source"), col("w_final").as("w"))
        Sampling.mixFromWeights(docs, "source",
            TextOps.tokenCount(col("text")).cast("long"), col("text"),
            w, budgetTokens = 15000L)
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            sum(TextOps.tokenCount(col("text")).cast("long")).as("tok_kept"),
            min("doc_id").as("min_kept_id"))
          .orderBy("source")
      },
      Some(mixMaterializeOracle("0.1", 4, 15000L))),

    // ---- phase-interpolated mixture SCHEDULE (p33): curriculum
    // anneal over the p31 endpoints —
    // the multi-phase data schedule a production run executes:
    // 5 phases interpolate from the natural mixture (w_init) to the
    // DoReMi-solved one (w_final) at dyadic α, each phase getting its
    // integer token allocation under a fixed per-phase budget. All
    // arithmetic in source space; the oracle chains the full p31 CTE
    // stack into the interpolation and floor.
    NamedQuery("p33_mixture_schedule",
      (s, dir) => {
        val w = Sampling.domainReweight(Tables.documents(s, dir),
            "source", "text", eta = 0.1, rounds = 4)
          .select("source", "w_init", "w_final")
        Sampling.mixtureSchedule(w, phases = 5, phaseBudget = 10000L)
          .orderBy("phase", "source")
      },
      Some(mixtureScheduleOracle("0.1", 4, 5, 10000L))),

    // ---- PER-PHASE materialization (p34): the full phased-curation
    // chain executed end to end — p31 solves the mixture, p33
    // schedules 5 interpolated phases, and EACH phase's weights
    // materialize through the p32 content-hash rule into its own
    // training subset (per-phase budget 5000 tokens). One Catalyst
    // plan, ONE corpus scan: the tokenize feeds the solve, and a
    // single phase-aware broadcast threshold join (5 rows per doc)
    // replaces a filter pass per phase; the gate pins the realized
    // per-(phase, source) doc/token totals, and the oracle replays
    // solve → schedule → thresholds → keeps in one CTE stack.
    NamedQuery("p34_phased_materialize",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val sched = Sampling.mixtureSchedule(
          Sampling.domainReweight(docs, "source", "text",
              eta = 0.1, rounds = 4)
            .select("source", "w_init", "w_final"),
          phases = 5, phaseBudget = 5000L)
        Sampling.mixFromSchedule(docs, "source",
            TextOps.tokenCount(col("text")).cast("long"), col("text"),
            sched.select("phase", "source", "w"), budgetTokens = 5000L)
          .groupBy("phase", "source")
          .agg(count(lit(1)).as("n_kept"),
            sum(TextOps.tokenCount(col("text")).cast("long")).as("tok_kept"))
          .orderBy("phase", "source")
      },
      Some(phasedMaterializeOracle("0.1", 4, 5, 5000L))),

    // ---- SOFT dedup weights (d34): downweight near-dup docs by
    // 1/|cluster| instead of dropping them — the reweighting
    // alternative to d12's hard drop, feeding the sampling stage a
    // weight column (effective token mass counts each near-dup family
    // once). Same planted mirror corpus and memoized signatures as
    // d12; the oracle chains d12's component CTEs + the size/weight
    // arithmetic + the effective-token product.
    NamedQuery("d34_soft_dedup_weights",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
        val all = docs.unionByName(planted)
        Dedup.softDedupWeights(all, "doc_id", "text",
            n = 3, numHashes = MhHashes, bands = MhBands, minJaccard = 0.5,
            iters = 4, sig = Some(plantedMinhashSig(s, dir)))
          .withColumnRenamed("id", "doc_id")
          .join(all.select(col("doc_id"),
            TextOps.tokenCount(col("text")).cast("long").as("__nt")), "doc_id")
          .withColumn("eff_tokens", round(col("__nt") / col("cluster_size"), 4))
          .select("doc_id", "label", "cluster_size", "weight", "eff_tokens")
          .orderBy("doc_id")
      },
      Some(softDedupOracle(MhHashes, MhBands, 0.5, iters = 4))),

    // ---- vector-index DELETES: tombstones + compaction (s29) — the
    // embedding-side twin of d32 (no 100 TB index escapes opt-outs).
    // Deletes land as an append-only tombstone side-table the serve
    // path anti-joins above the pruned list scan (index files
    // untouched); compaction folds them into the per-list layout and
    // clears the side-table. Phase 1 serves with tombstones live,
    // phase 2 after compaction; BOTH must equal an index built
    // without the deleted rows — s23's filtered oracle chain with
    // predicate "not deleted", emitted under both phase tags.
    NamedQuery("s29_ivf_tombstone_compaction",
      (s, dir) => {
        import graft.ml.VectorSearch
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val path = graft.ScratchDirs.scratch("ivf_idx_ts")
        val cents = Similarity.hyperplanes(dim = 64, nBits = IvfLists, seed = 7L)
        VectorSearch.writeIvfIndex(Similarity.assignFixed(emb, cents),
          "cluster", cents.zipWithIndex.map(_.swap), path)
        VectorSearch.tombstoneIvfIndex(
          emb.filter(col("vec_id") % 5 === 0).select("vec_id"), "vec_id", path)
        val q = emb.filter(col("vec_id") < 20)
        val centsV = VectorSearch.readIvfIndexCentroids(s, path).map(_._2)
        def tag(df: org.apache.spark.sql.DataFrame, p: Int) =
          df.select(lit(p).as("phase"), col("query_id"),
            col("neighbor_id"), col("cos"), col("rank"))
        // phase 1 pins BEFORE compaction rewrites the scanned files
        val p1 = tag(Similarity.ivfServe(q,
          VectorSearch.readLiveIvfAssignments(s, path), centsV,
          k = 5, nprobe = IvfProbes), 1).localCheckpoint()
        VectorSearch.compactIvfIndex(s, path, "cluster")
        val (loaded, _) = VectorSearch.readIvfIndex(s, path)
        val p2 = tag(Similarity.ivfServe(q, loaded, centsV,
          k = 5, nprobe = IvfProbes), 2)
        p1.unionByName(p2).orderBy("phase", "query_id", "rank")
      },
      Some(ivfTombstoneOracle(dim = 64, nlist = IvfLists, nprobe = IvfProbes,
        k = 5, seed = 7L, predSql = "l.vec_id % 5 <> 0"))),

    // ---- temporal split with an EMBARGO gap (p35): train < t0−gap,
    // test ≥ t0, and the gap rows between them DROPPED — the
    // time-series counterpart of p16's group-leakage split (features
    // built from trailing windows, q47-style, would otherwise let
    // train rows within `gap` of the boundary read test-period
    // activity). Pure partition-parallel row tagging (one scan, no
    // shuffle before the audit agg); the audit emits per-split
    // bounds so the gap is PROVABLE, not assumed.
    NamedQuery("p35_temporal_embargo_split",
      (s, dir) => {
        val t0 = lit("2024-01-22").cast("date")
        val gap = 2
        Tables.events(s, dir)
          .withColumn("d", to_date(col("ts")))
          .withColumn("split",
            when(col("d") < date_sub(t0, gap), "train")
              .when(col("d") >= t0, "test")
              .otherwise("embargo"))
          .filter(col("split") =!= "embargo")
          .groupBy("split", "event_type")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            date_format(min(col("d")), "yyyy-MM-dd").as("d_min"),
            date_format(max(col("d")), "yyyy-MM-dd").as("d_max"))
          .orderBy("split", "event_type")
      },
      Some("""WITH e AS (SELECT event_type, user_id, CAST(ts AS DATE) AS d,
             |    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-22' - INTERVAL 2 DAY
             |           THEN 'train'
             |         WHEN CAST(ts AS DATE) >= DATE '2024-01-22' THEN 'test'
             |         ELSE 'embargo' END AS split
             |  FROM events)
             |SELECT split, event_type, count(*) AS n_events,
             |  count(DISTINCT user_id) AS n_users,
             |  strftime(min(d), '%Y-%m-%d') AS d_min,
             |  strftime(max(d), '%Y-%m-%d') AS d_max
             |FROM e WHERE split <> 'embargo'
             |GROUP BY split, event_type
             |ORDER BY split, event_type""".stripMargin)),

    // ---- near-dup-AWARE budget selection (p36): p14's quality-ordered
    // token-budget pick re-costed in EFFECTIVE tokens — each doc's
    // weight is n_tokens/|near-dup cluster| (d34's soft-dedup mass), so
    // a family of near-copies spends its token mass ONCE against the
    // budget instead of once per copy (the data-constrained selection
    // move: budget buys unique content, not bytes). Weights land as
    // exact micro-token integers so the running sum stays cross-engine
    // exact; selection reuses budgetSelect's per-score histogram (only
    // the straddling score group pays a window — never a global sort).
    NamedQuery("p36_neardup_aware_budget",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val planted = docs.withColumn("doc_id", col("doc_id") + 1000000)
        val all = docs.unionByName(planted)
        val sizes = Dedup.softDedupWeights(all, "doc_id", "text",
            n = 3, numHashes = MhHashes, bands = MhBands, minJaccard = 0.5,
            iters = 4, sig = Some(plantedMinhashSig(s, dir)))
          .withColumnRenamed("id", "doc_id")
          .select("doc_id", "cluster_size")
        val scored = all
          .select(col("doc_id"),
            size(array_intersect(array_distinct(TextOps.tokens(col("text"))),
              typedLit(TextOps.langMarkers.head._2))).as("score"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
          .join(sizes, "doc_id")
          .withColumn("eff_u",
            round(col("n_tokens") * 1000000.0 / col("cluster_size"), 0)
              .cast("long"))
        Sampling.budgetSelect(scored, "doc_id", col("score"), col("eff_u"),
            budget = 20000L * 1000000L)
          .select(col("id").as("doc_id"), col("score"),
            col("w").as("eff_micro_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""${softDedupCtes(MhHashes, MhBands, 0.5, 4)},
             |sc AS (SELECT doc_id,
             |    CAST(len(list_intersect(list_distinct(
             |      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                  x -> len(x) > 0)),
             |      ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'for']))
             |      AS BIGINT) AS score
             |  FROM all_docs),
             |eff AS (SELECT l.id AS doc_id,
             |    CAST(round(tk.n_tokens * 1000000.0 / cs.cluster_size, 0)
             |      AS BIGINT) AS eff_u
             |  FROM l4 l JOIN cs USING (label) JOIN tk ON tk.id = l.id),
             |c AS (SELECT sc.doc_id, sc.score, eff.eff_u,
             |    coalesce(sum(eff_u) OVER (ORDER BY score DESC, sc.doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM sc JOIN eff USING (doc_id))
             |SELECT doc_id, score, eff_u AS eff_micro_tokens FROM c
             |WHERE cum < 20000000000 ORDER BY doc_id""".stripMargin)),

    // ---- RM3-style pseudo-relevance feedback (s38): the two-pass
    // retrieval loop (Rocchio/RM3): pass 1 retrieves BM25 top-3
    // feedback docs per query, the feedback docs' heaviest terms (by
    // summed tf, minus the original query terms) expand the query by
    // 2 terms, pass 2 re-retrieves top-10 with the expanded term set.
    // Both passes share ONE cached posting table (bm25TopK's cache);
    // expansion is rank-windowed per query over feedback-doc terms
    // only — never corpus-wide. The oracle chains the s27 CTEs through
    // feedback, expansion, and the second scoring pass.
    NamedQuery("s38_rm3_query_expansion",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val qs = graft.Caches.cached(docs.filter(col("doc_id") % 125 === 7)
          .select(col("doc_id").as("query_id"),
            concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("qtext")))
        // ONE posting table feeds BOTH retrieval passes AND the
        // feedback-term counts (r15, guide §2.4): bm25TopK per pass
        // would tokenize+aggregate the corpus once per call (two
        // corpus passes), and the old feedback-term count re-tokenized
        // the feedback docs' text a third time — the posting rows of
        // the ≤3 feedback docs already carry exactly those counts
        // (sum(tf) ≡ count of occurrences), so the tf cache serves all
        // three consumers.
        val tf = graft.Caches.cached(Retrieval.postingsOf(docs, "doc_id", "text"))
        val fb = Retrieval.bm25TopKPostings(tf, qs, "query_id", "qtext", k = 3)
        val fbTf = fb.select("query_id", "doc_id").join(tf, "doc_id")
          .groupBy("query_id", "tok").agg(sum("tf").as("ftf"))
        val qtok = qs.select(col("query_id"),
          explode(array_distinct(TextOps.tokens(col("qtext")))).as("tok"))
        val wE = Window.partitionBy("query_id")
          .orderBy(col("ftf").desc, col("tok"))
        val exp = fbTf.join(qtok, Seq("query_id", "tok"), "left_anti")
          .withColumn("rk", row_number().over(wE))
          .filter(col("rk") <= 2)
        // CACHED: q2 embeds the whole pass-1 DAG, and the pass-2 scorer
        // references its query frame more than once (df lookup + the
        // scoring join) — uncached, pass 1 re-executes per reference
        // (measured 8.0 s → the two-pass floor)
        val q2 = graft.Caches.cached(qs.join(
            exp.groupBy("query_id")
              .agg(concat_ws(" ", array_sort(collect_list("tok"))).as("etext")),
            Seq("query_id"), "left")
          .select(col("query_id"),
            concat_ws(" ", col("qtext"), coalesce(col("etext"), lit("")))
              .as("qtext")))
        Retrieval.bm25TopKPostings(tf, q2, "query_id", "qtext", k = 10)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${bm25Ctes()},
             |fb AS (SELECT query_id, doc_id FROM qrk WHERE rank <= 3),
             |ftf AS (SELECT fb.query_id, tf.tok, sum(tf.tf) AS ftf
             |  FROM fb JOIN tf USING (doc_id) GROUP BY 1, 2),
             |exp AS (SELECT query_id, tok FROM (
             |    SELECT f.query_id, f.tok, row_number() OVER (
             |      PARTITION BY f.query_id ORDER BY f.ftf DESC, f.tok) AS rk
             |    FROM ftf f
             |    WHERE NOT EXISTS (SELECT 1 FROM q
             |      WHERE q.query_id = f.query_id AND q.tok = f.tok))
             |  WHERE rk <= 2),
             |q2 AS (SELECT query_id, tok FROM q
             |       UNION SELECT query_id, tok FROM exp),
             |dfq2 AS (SELECT tok, count(*) AS df FROM tf
             |  WHERE tok IN (SELECT DISTINCT tok FROM q2) GROUP BY 1),
             |co2 AS (SELECT q2.query_id, tf.doc_id,
             |    ln(1 + (st.n_docs - dfq2.df + 0.5) / (dfq2.df + 0.5)) *
             |      (tf.tf * (1.2 + 1.0)) /
             |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS w
             |  FROM q2 JOIN tf USING (tok) JOIN dfq2 USING (tok)
             |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
             |  WHERE tf.doc_id <> q2.query_id),
             |sc2 AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
             |  FROM co2 GROUP BY 1, 2),
             |rk2 AS (SELECT query_id, doc_id, score, row_number() OVER (
             |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
             |  FROM sc2)
             |SELECT query_id, doc_id, score, rank FROM rk2 WHERE rank <= 10
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- LSH RECALL AUDIT (d37): the dedup-quality monitor — every
    // production MinHash deployment must answer "which true near-dup
    // pairs do my bands miss?" before trusting the kept set. Ground
    // truth = exact shingle-Jaccard pairs at ≥0.5 (the d02 inverted-
    // index shape, pair-linear); candidates = the d08 banded pairs
    // with NO estimate threshold (a pair is 'caught' iff any band
    // fired). Per-Jaccard-bucket recall exposes exactly where the
    // band/row tradeoff loses pairs (theory: catch probability
    // 1-(1-j^rows)^bands rises with j — the audit measures it on the
    // real corpus). The oracle chains the d08 CTEs' own shingle table
    // into the exact pairs and the candidate anti-side.
    NamedQuery("d37_lsh_recall_audit",
      (s, dir) => {
        // FIXED-SIZE audit sample (first 500 docs): exact all-pairs
        // ground truth is inherently quadratic — that is WHY LSH
        // exists — so at scale the audit estimates recall on a
        // constant-size sample (at sf0.01 the sample IS the corpus);
        // measured uncapped at 30x it read 31 s and kept growing
        val docs = Tables.documents(s, dir).select("doc_id", "text")
          .filter(col("doc_id") < 500)
        // GRADED near-dups: token-prefix truncations at 0.5/0.7/0.9 of
        // each doc (prefix shingles ⊂ full shingles → Jaccard ≈ the
        // kept fraction), so the audit measures recall across buckets
        // 3–9 instead of only exact copies
        val toks = TextOps.tokens(col("text"))
        val frac = when(col("doc_id") % 3 === 0, 0.5)
          .when(col("doc_id") % 3 === 1, 0.7).otherwise(0.9)
        val variants = docs.select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(toks, lit(1),
            greatest(lit(3), floor(size(toks) * frac).cast("int"))))
            .as("text"))
        val all = docs.unionByName(variants)
        val exact = Dedup.ngramJaccardPairs(all, "doc_id", "text",
            n = 3, minJaccard = 0.2, maxDf = 1 << 30)
          .select("id_a", "id_b", "jaccard")
        val caught = Dedup.minhashLshPairsPortable(all, "doc_id", "text",
            n = 3, numHashes = MhHashes, bands = MhBands, minJaccard = 0.0)
          .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
        exact.join(caught, Seq("id_a", "id_b"), "left")
          .withColumn("bucket",
            least(floor(col("jaccard") * 10).cast("int"), lit(9)))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce(col("hit"), lit(0L))).as("n_caught"),
            round(sum(coalesce(col("hit"), lit(0L))) * lit(1.0) /
              count(lit(1)), 4).as("recall"))
          .orderBy("bucket")
      },
      Some {
        val gradedDocs =
          """SELECT doc_id, text FROM documents WHERE doc_id < 500
            |  UNION ALL
            |  SELECT doc_id + 1000000,
            |    array_to_string(ts[1:greatest(3, CAST(floor(len(ts) * f) AS INT))], ' ')
            |  FROM (SELECT doc_id,
            |      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            |                  x -> len(x) > 0) AS ts,
            |      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 0.5
            |           WHEN 1 THEN 0.7 ELSE 0.9 END AS f
            |    FROM documents WHERE doc_id < 500)""".stripMargin
        val base = minhashPortableOracle(MhHashes, MhBands, 0.0, gradedDocs)
        val ctes = base.substring(0, base.indexOf(",\nver AS"))
        s"""$ctes,
           |exsz AS (SELECT id, count(*) AS sz FROM ex GROUP BY id),
           |epr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
           |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.id < b.id
           |  GROUP BY 1, 2),
           |exact AS (SELECT id_a, id_b,
           |    round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS j
           |  FROM epr JOIN exsz sa ON sa.id = epr.id_a
           |            JOIN exsz sb ON sb.id = epr.id_b
           |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= 0.2),
           |aud AS (SELECT least(CAST(floor(j * 10) AS INT), 9) AS bucket,
           |    CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
           |  FROM exact LEFT JOIN cand c USING (id_a, id_b))
           |SELECT bucket, count(*) AS n_exact,
           |  CAST(sum(hit) AS BIGINT) AS n_caught,
           |  round(sum(hit) * 1.0 / count(*), 4) AS recall
           |FROM aud GROUP BY bucket ORDER BY bucket""".stripMargin
      }),

    // ---- CDC-maintained dedup index (d38): the exact-dedup index IS
    // a (count, min-id) materialized view keyed by the content hash —
    // so keeping it in sync with a lakehouse table under
    // inserts/updates/deletes is EXACTLY the io27 affected-group
    // refresh, not bespoke index surgery. The subtlety that forces
    // the MV strategy: content is SHARED (duplicate groups span
    // rows), so a row's delete may NOT remove its hash (another copy
    // still holds it) and min-id must resurface the runner-up copy —
    // both non-abelian, both handled by re-aggregating exactly the
    // hashes the change feed touched. History: v1 = %4∈{0,1,2}
    // (hashes computed at ingest, the production shape); v2 deletes
    // %4=0, rewrites %4=1's content (new hash), keeps %4=2 untouched,
    // inserts %4=3. The oracle rebuilds the index from the v2 corpus
    // from scratch — sync ≡ rebuild is the gate.
    NamedQuery("d38_cdc_dedup_index_sync",
      (s, dir) => {
        import graft.sources.{MaterializedView, Sources}
        val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
        val stage = graft.ScratchDirs.scratch(s"cdc_dedup_base_$safe")
        val idxPath = graft.ScratchDirs.scratch(s"cdc_dedup_idx_$safe")
        // build-once lifecycle (the io30 pattern): the staged commits +
        // index build + CDF-synced refresh run once per (session, dir);
        // re-measured runs serve the synced index, so min-of-runs is
        // the serve plan, not a re-paid lifecycle
        val v = graft.Memo.artifact(s, s"d38-lifecycle|$dir") {
          graft.Fs.deleteRecursive(s, stage)
          graft.Fs.deleteRecursive(s, idxPath)
          val docs = Tables.documents(s, dir).select("doc_id", "text")
          def hashed(df: org.apache.spark.sql.DataFrame) =
            df.select(col("doc_id"), md5(col("text")).as("text_hash"))
          Sources.snapshotCommit(
            hashed(docs.filter(col("doc_id") % 4 < 3)), stage)
          MaterializedView.buildMinMax(s, stage, idxPath,
            rowKey = "doc_id", keyCols = Seq("text_hash"), valCol = "doc_id")
          Sources.snapshotCommit(
            hashed(docs.filter(col("doc_id") % 4 === 1)
                .withColumn("text", concat(col("text"), lit(" v2"))))
              .unionByName(hashed(docs.filter(col("doc_id") % 4 === 2)))
              .unionByName(hashed(docs.filter(col("doc_id") % 4 === 3))),
            stage, overwrite = true)
          Integer.valueOf(MaterializedView.refreshMinMax(s, stage, idxPath))
        }.intValue
        Sources.snapshotRead(s, idxPath, v)
          .select(col("text_hash"), col("mv_count").as("n_copies"),
            col("min_doc_id").as("first_id"))
          .orderBy("text_hash")
      },
      Some("""WITH t AS (SELECT doc_id, md5(text || ' v2') AS text_hash
             |    FROM documents WHERE doc_id % 4 = 1
             |  UNION ALL SELECT doc_id, md5(text) FROM documents
             |    WHERE doc_id % 4 IN (2, 3))
             |SELECT text_hash, count(*) AS n_copies,
             |  min(doc_id) AS first_id
             |FROM t GROUP BY text_hash ORDER BY text_hash""".stripMargin)),

    // ---- blocked ENTITY RESOLUTION (d36): fuzzy record linkage over
    // the part-name vocabulary — blocking on the name's noun token,
    // char-trigram Jaccard ≥ 0.4 inside each block, min-label
    // transitive closure, every record assigned its entity's min-id
    // representative. Pair work is Σ|block|² over DISTINCT names
    // (records collapse to names first), so a billion rows of a 64-name
    // vocabulary score 64 names — the property that makes ER feasible
    // at 100 TB. The oracle replays gramming, blocking, Jaccard, and
    // four unrolled min-label supersteps.
    NamedQuery("d36_blocked_entity_clusters",
      (s, dir) =>
        Dedup.blockedEntityClusters(Tables.part(s, dir),
            idCol = "p_partkey", nameCol = "p_name",
            blockOf = c => get(split(c, " "), lit(1)),
            minJaccard = 0.4, iters = 4)
          .orderBy("p_partkey"),
      Some(entityClustersOracle))
  )

  /** Oracle for d36: distinct-name gramming → noun-block candidate
    * pairs → trigram Jaccard → unrolled min-label closure →
    * record-level assignment. */
  private def entityClustersOracle: String = {
    val steps = OracleFragments.minLabelSteps("symp", 4)
    s"""WITH names AS (SELECT p_name, min(p_partkey) AS id
       |  FROM part GROUP BY p_name),
       |gr AS (SELECT DISTINCT id, split_part(p_name, ' ', 2) AS blk,
       |    substr(p_name, t.i, 3) AS g
       |  FROM names CROSS JOIN LATERAL (
       |    SELECT unnest(generate_series(1, greatest(len(p_name) - 2, 1))) AS i) t),
       |sz AS (SELECT id, count(*) AS sz FROM gr GROUP BY id),
       |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
       |  FROM gr a JOIN gr b ON a.blk = b.blk AND a.g = b.g AND a.id < b.id
       |  GROUP BY 1, 2),
       |pairs AS (SELECT id_a, id_b
       |  FROM pr JOIN sz sa ON sa.id = pr.id_a JOIN sz sb ON sb.id = pr.id_b
       |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= 0.4),
       |v AS (SELECT id FROM names),
       |symp AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |         UNION ALL SELECT id_b, id_a FROM pairs),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps
       |SELECT p.p_partkey, l.label AS entity_id, p.p_name
       |FROM part p JOIN names n ON p.p_name = n.p_name
       |JOIN l4 l ON l.id = n.id
       |ORDER BY p_partkey""".stripMargin
  }

  /** t19's full oracle — the frozen-weight quality scorer replayed in
    * SQL. Shared verbatim by sw09 (the streaming lift scores the same
    * documents through the same projection, so the batch oracle is the
    * exact expected per-document output). */
  /** The t19 frozen-scorer CTE chain (features → z), parameterized by
    * the source relation so p19's composed oracle can run it over its
    * planted corpus. Ends at `z` (id, z). */
  private def qualityModelCtes(srcRel: String): String =
    s"""t AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                x -> len(x) > 0) AS ts,
       |    CASE WHEN len(text) = 0 THEN 0.0 ELSE
       |      (len(text) - len(regexp_replace(text, '[.,!?;:''"()\\[\\]{}-]', '', 'g')))::DOUBLE
       |      / len(text) END AS praw
       |  FROM $srcRel),
       |g AS (SELECT doc_id, ts, praw,
       |    list_transform(generate_series(2, len(ts)),
       |                   i -> array_to_string(ts[i-1:i], ' ')) AS g2
       |  FROM t),
       |f AS (SELECT doc_id AS id,
       |    round(least(len(ts)::DOUBLE / 200.0, 1.0), 6) AS f_len,
       |    round(CASE WHEN len(ts) = 0 THEN 0.0 ELSE
       |      len(list_filter(ts, x -> list_contains(${sqlList(enStop)}, x)))::DOUBLE
       |      / len(ts) END, 6) AS f_stop,
       |    round(praw, 6) AS f_punct,
       |    CASE WHEN len(g2) = 0 THEN 0.0
       |      ELSE round(1.0 - len(list_distinct(g2))::DOUBLE / len(g2), 6) END
       |      AS f_dup2,
       |    round(CASE WHEN len(ts) = 0 THEN 0.0 ELSE
       |      CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE)
       |        / len(ts) END / 10.0, 6) AS f_mtl
       |  FROM g),
       |z AS (SELECT id, -2.5 + 3.0 * f_len + 6.0 * f_stop
       |    - 8.0 * f_punct - 4.0 * f_dup2 + 2.0 * f_mtl AS z
       |  FROM f)""".stripMargin

  private[queries] lazy val qualityModelFixedOracle: String =
    s"""WITH ${qualityModelCtes("documents")}
       |SELECT id, round(1.0 / (1.0 + exp(-z)), 4) AS prob,
       |  CAST(CASE WHEN round(1.0 / (1.0 + exp(-z)), 4) >= 0.5
       |    THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM z ORDER BY id""".stripMargin

  /** sw24: the frozen-scorer arithmetic, admitted rows only. */
  private[queries] lazy val qualityModelAdmittedOracle: String =
    s"""WITH ${qualityModelCtes("documents")}
       |SELECT id, round(1.0 / (1.0 + exp(-z)), 4) AS prob,
       |  CAST(1 AS BIGINT) AS keep
       |FROM z WHERE round(1.0 / (1.0 + exp(-z)), 4) >= 0.5
       |ORDER BY id""".stripMargin

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Two-sided variant of [[minhashPortableOracle]]: new batch
    * (replays of every 7th doc, ids +1000000) vs the corpus — same
    * signature/band CTEs, candidates restricted to new×corpus. */
  private def minhashIncrementalOracle(numHashes: Int, bands: Int,
      minJaccard: Double): String = {
    val rows = numHashes / bands
    val minCols = (0 until numHashes)
      .map(i => s"min((h1 + $i * h2 + ${i.toLong * i}) % 2147483647) AS mh_$i")
      .mkString(",\n    ")
    val bandRows = (0 until bands).map { b =>
      val cat = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(mh_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($cat) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until numHashes)
      .map(i => s"CASE WHEN a.mh_$i = b.mh_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH all_docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
       |toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                             x -> len(x) > 0) AS ts
       |  FROM all_docs),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(ts) - 2), i -> array_to_string(ts[i:i+2], ' '))) AS arr
       |  FROM toks WHERE len(ts) >= 3),
       |ex AS (SELECT doc_id AS id, unnest(arr) AS sh FROM shs),
       |hs AS (SELECT id,
       |    CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) AS h2
       |  FROM ex),
       |sig AS (SELECT id,
       |    $minCols
       |  FROM hs GROUP BY id),
       |banded AS (
       |  $bandRows),
       |cand AS (SELECT DISTINCT a.id AS new_id, b.id AS corpus_id
       |         FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |         WHERE a.id >= 1000000 AND b.id < 1000000),
       |ver AS (SELECT new_id, corpus_id,
       |    round(($agree) / ${numHashes.toDouble}, 6) AS est_jaccard
       |  FROM cand JOIN sig a ON new_id = a.id JOIN sig b ON corpus_id = b.id)
       |SELECT new_id, corpus_id, est_jaccard FROM ver
       |WHERE est_jaccard >= $minJaccard
       |ORDER BY new_id, corpus_id""".stripMargin
  }

  /** d27's full oracle — the persisted-MinHash-index ingest replayed:
    * index = even docs' signatures; batch = odd docs + planted replays
    * of indexed docs (+1000000, cross gate) and of batch docs
    * (+2000000, within gate). Same signature/band CTEs as
    * [[minhashIncrementalOracle]]; the two gates replay the operator's
    * order exactly (within-batch lower-id-neighbor drop FIRST, then
    * survivors vs index). Docs too short to sign appear in batch_ids
    * but in neither drop set — admitted, as in the operator. */
  /** Oracle for d33 near-dup index deletes: the d27 ingest chain with
    * the index side restricted to LIVE rows (evens minus the %6
    * tombstones) and the batch = fresh odds + replays of deleted
    * (+1e6, must ADMIT) and retained (+2e6, must REJECT) contents.
    * Phase 2 re-ingests the same feed after compaction: every
    * SIGNABLE doc is rejected (phase-1 admissions were appended and
    * survived the rewrite; re-admitted deleted content is indexed
    * again), while docs too short to sign (< n tokens — no shingles,
    * never indexed) re-admit in EVERY phase, exactly as the operator
    * does. The oracle emits the phase-1 set under phase 1 and the
    * unsignable batch ids under phase 2 — an empty phase-2 set only
    * when the corpus happens to have no sub-n-token docs (the sf
    * corpora), not by construction. */
  private def minhashTombstoneOracle(numHashes: Int, bands: Int,
      minJaccard: Double): String = {
    val rows = numHashes / bands
    val minCols = (0 until numHashes)
      .map(i => s"min((h1 + $i * h2 + ${i.toLong * i}) % 2147483647) AS mh_$i")
      .mkString(",\n    ")
    val bandRows = (0 until bands).map { b =>
      val cat = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(mh_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($cat) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until numHashes)
      .map(i => s"CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH all_docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 6 = 0
       |  UNION ALL SELECT doc_id + 2000000, text FROM documents
       |    WHERE doc_id % 2 = 0 AND doc_id % 6 <> 0),
       |toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                             x -> len(x) > 0) AS ts
       |  FROM all_docs),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(ts) - 2), i -> array_to_string(ts[i:i+2], ' '))) AS arr
       |  FROM toks WHERE len(ts) >= 3),
       |ex AS (SELECT doc_id AS id, unnest(arr) AS sh FROM shs),
       |hs AS (SELECT id,
       |    CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) AS h2
       |  FROM ex),
       |sig AS (SELECT id,
       |    $minCols
       |  FROM hs GROUP BY id),
       |banded AS (
       |  $bandRows),
       |batch_ids AS (SELECT doc_id AS id FROM all_docs
       |  WHERE doc_id >= 1000000 OR doc_id % 4 = 1),
       |live_ids AS (SELECT doc_id AS id FROM documents
       |  WHERE doc_id % 2 = 0 AND doc_id % 6 <> 0),
       |dropped_within AS (
       |  SELECT DISTINCT b.id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  JOIN sig sa ON a.id = sa.id JOIN sig sb ON b.id = sb.id
       |  WHERE a.id < b.id
       |    AND a.id IN (SELECT id FROM batch_ids)
       |    AND b.id IN (SELECT id FROM batch_ids)
       |    AND round(($agree) / ${numHashes.toDouble}, 6) >= $minJaccard),
       |matched AS (
       |  SELECT DISTINCT a.id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  JOIN sig sa ON a.id = sa.id JOIN sig sb ON b.id = sb.id
       |  WHERE a.id IN (SELECT id FROM batch_ids)
       |    AND a.id NOT IN (SELECT id FROM dropped_within)
       |    AND b.id IN (SELECT id FROM live_ids)
       |    AND round(($agree) / ${numHashes.toDouble}, 6) >= $minJaccard)
       |SELECT 1 AS phase, id AS doc_id FROM batch_ids
       |WHERE id NOT IN (SELECT id FROM dropped_within)
       |  AND id NOT IN (SELECT id FROM matched)
       |UNION ALL
       |SELECT 2 AS phase, id AS doc_id FROM batch_ids
       |WHERE id NOT IN (SELECT id FROM sig)
       |ORDER BY phase, doc_id""".stripMargin
  }

  private def minhashIndexIngestOracle(numHashes: Int, bands: Int,
      minJaccard: Double): String = {
    val rows = numHashes / bands
    val minCols = (0 until numHashes)
      .map(i => s"min((h1 + $i * h2 + ${i.toLong * i}) % 2147483647) AS mh_$i")
      .mkString(",\n    ")
    val bandRows = (0 until bands).map { b =>
      val cat = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(mh_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($cat) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until numHashes)
      .map(i => s"CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH all_docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 1),
       |toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                             x -> len(x) > 0) AS ts
       |  FROM all_docs),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(ts) - 2), i -> array_to_string(ts[i:i+2], ' '))) AS arr
       |  FROM toks WHERE len(ts) >= 3),
       |ex AS (SELECT doc_id AS id, unnest(arr) AS sh FROM shs),
       |hs AS (SELECT id,
       |    CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) AS h2
       |  FROM ex),
       |sig AS (SELECT id,
       |    $minCols
       |  FROM hs GROUP BY id),
       |banded AS (
       |  $bandRows),
       |batch_ids AS (SELECT doc_id AS id FROM all_docs
       |  WHERE doc_id >= 1000000 OR doc_id % 2 = 1),
       |dropped_within AS (
       |  SELECT DISTINCT b.id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  JOIN sig sa ON a.id = sa.id JOIN sig sb ON b.id = sb.id
       |  WHERE a.id < b.id
       |    AND a.id IN (SELECT id FROM batch_ids)
       |    AND b.id IN (SELECT id FROM batch_ids)
       |    AND round(($agree) / ${numHashes.toDouble}, 6) >= $minJaccard),
       |matched AS (
       |  SELECT DISTINCT a.id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  JOIN sig sa ON a.id = sa.id JOIN sig sb ON b.id = sb.id
       |  WHERE a.id IN (SELECT id FROM batch_ids)
       |    AND a.id NOT IN (SELECT id FROM dropped_within)
       |    AND b.id < 1000000 AND b.id % 2 = 0
       |    AND round(($agree) / ${numHashes.toDouble}, 6) >= $minJaccard)
       |SELECT id AS doc_id FROM batch_ids
       |WHERE id NOT IN (SELECT id FROM dropped_within)
       |  AND id NOT IN (SELECT id FROM matched)
       |ORDER BY doc_id""".stripMargin
  }

  /** p18's full oracle — histogram cells, cumulative counts, and
    * quantile picks replayed exactly. Shared verbatim by sw15 (the
    * streamed cells are mergeable by construction, so the
    * incrementally-maintained sketch must extract identically). */
  private[queries] lazy val histQuantilesOracle: String =
    """WITH t AS (SELECT source,
      |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                    x -> len(x) > 0))::BIGINT AS n
      |  FROM documents),
      |cells AS (SELECT source, n // 16 AS b, count(*) AS cnt
      |  FROM t GROUP BY 1, 2),
      |cum AS (SELECT source, b, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY b) AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS total
      |  FROM cells),
      |qt AS (SELECT * FROM cum
      |  CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q)),
      |sel AS (SELECT source, q, max(total) AS n_rows, min(b) AS bmin
      |  FROM qt WHERE cum >= CAST(ceil(q * total) AS BIGINT)
      |  GROUP BY 1, 2)
      |SELECT source, q, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(bmin * 16 AS BIGINT) AS bucket_lo
      |FROM sel ORDER BY source, q""".stripMargin

  /** sw14's oracle — the streaming near-dup admission gate replayed in
    * batch: index = even docs; feed = odd docs + planted replays of
    * indexed docs (+1000000). A feed doc is admitted iff NO indexed doc
    * shares a band hash (same band position) and agrees on ≥ minJaccard
    * of the signature — the cross gate of
    * [[minhashIndexIngestOracle]], alone (the stream stage is
    * stateless; within-stream near-dup is sw04's candidate job). */
  private[queries] def minhashStreamAdmissionOracle(numHashes: Int,
      bands: Int, minJaccard: Double): String = {
    val rows = numHashes / bands
    val minCols = (0 until numHashes)
      .map(i => s"min((h1 + $i * h2 + ${i.toLong * i}) % 2147483647) AS mh_$i")
      .mkString(",\n    ")
    val bandRows = (0 until bands).map { b =>
      val cat = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(mh_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($cat) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until numHashes)
      .map(i => s"CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH all_docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
       |toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                             x -> len(x) > 0) AS ts
       |  FROM all_docs),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(ts) - 2), i -> array_to_string(ts[i:i+2], ' '))) AS arr
       |  FROM toks WHERE len(ts) >= 3),
       |ex AS (SELECT doc_id AS id, unnest(arr) AS sh FROM shs),
       |hs AS (SELECT id,
       |    CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) AS h2
       |  FROM ex),
       |sig AS (SELECT id,
       |    $minCols
       |  FROM hs GROUP BY id),
       |banded AS (
       |  $bandRows),
       |feed_ids AS (SELECT doc_id AS id FROM all_docs
       |  WHERE doc_id >= 1000000 OR doc_id % 2 = 1),
       |matched AS (
       |  SELECT DISTINCT a.id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  JOIN sig sa ON a.id = sa.id JOIN sig sb ON b.id = sb.id
       |  WHERE a.id IN (SELECT id FROM feed_ids)
       |    AND b.id < 1000000 AND b.id % 2 = 0
       |    AND round(($agree) / ${numHashes.toDouble}, 6) >= $minJaccard)
       |SELECT id FROM feed_ids
       |WHERE id NOT IN (SELECT id FROM matched)
       |ORDER BY id""".stripMargin
  }

  /** Shared by p06 (the operator) and io03 (the partitioned-parquet
    * export round-trip of the same assignment) — one definition so the
    * two checks can never drift. */
  private[queries] def shuffleShardOracle: String =
    """WITH h AS (
      |  SELECT doc_id, n_chars,
      |         md5('epoch0|' || CAST(doc_id AS VARCHAR)) AS hx
      |  FROM documents),
      |s AS (SELECT doc_id, n_chars, hx,
      |    CAST(CAST('0x' || substr(hx, 1, 8) AS BIGINT) % 16 AS INT) AS shard
      |  FROM h),
      |r AS (SELECT *, row_number() OVER (
      |    PARTITION BY shard ORDER BY hx, doc_id) AS pos FROM s)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(CASE WHEN pos = 1 THEN doc_id END) AS first_doc
      |FROM r GROUP BY shard ORDER BY shard""".stripMargin

  private[queries] def DecontamN = 4

  /** s35 context-window token budget: small enough that the fused
    * top-10 truncates (sf docs average ~54 tokens, so a full top-10
    * runs ~480 — at 300 every query's walk actually cuts). */
  private def RagBudget = 300

  /** s39's per-serve query-batch cap — small enough to BIND at the
    * sf0.01 gate scale (only FOUR %125 queries exist there: ids
    * 7/132/257/382), so the gate proves the capped semantics rather
    * than a no-op passthrough. Production sets this in the hundreds;
    * the plan shape is cap-independent. */
  private def TripletBatchCap = 3

  /** CTE chain `toksd → shd → exd → bench → flagged`: corpus docs
    * (doc_id%10≠0) sharing any n-gram with the benchmark slice
    * (doc_id%10=0) — mirrors Dedup.contaminatedIds (same shingle
    * family as the d02 oracle). */
  private[queries] def decontamCtes(n: Int): String =
    s"""toksd AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                             x -> len(x) > 0) AS ts
       |  FROM documents),
       |shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(ts) - ${n - 1}),
       |    i -> array_to_string(ts[i:i+${n - 1}], ' '))) AS shs
       |  FROM toksd WHERE len(ts) >= $n),
       |exd AS (SELECT doc_id, unnest(shs) AS ng FROM shd),
       |bench AS (SELECT DISTINCT ng FROM exd WHERE doc_id % 10 = 0),
       |flagged AS (
       |  SELECT DISTINCT exd.doc_id FROM exd JOIN bench USING (ng)
       |  WHERE exd.doc_id % 10 != 0)""".stripMargin

  /** Shared unrolled CTEs for the k-round BPE trainer: s0 = char
    * segmentations of the word-frequency table; each round i counts
    * adjacent pairs (pr_i), picks the argmax under the shared total
    * order (b_i), and applies the merge with a literal replace (s_i+1)
    * — the exact loop bpeTrain runs. An exhausted round yields an
    * empty b_i; the LEFT-JOIN-ON-TRUE carry then keeps s_{i+1} = s_i
    * (frozen, like the Scala loop's early stop) while every later b
    * stays empty. */
  private def bpeCtes(k: Int, trainWhere: String = ""): String = {
    val tw = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    val sb = new StringBuilder(
      s"""toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            x -> len(x) > 0)) AS tok
        |  FROM documents$tw),
        |tf AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |s0 AS (SELECT tok, ' ' || array_to_string(
        |    list_transform(generate_series(1, len(tok)), i -> substr(tok, i, 1)),
        |    ' ') || ' ' AS seg, c FROM tf)""".stripMargin)
    for (i <- 0 until k) {
      sb ++= s""",
        |pr$i AS (SELECT x.syms[u.i] || ' ' || x.syms[u.i + 1] AS pair, x.c
        |  FROM (SELECT string_split(trim(seg), ' ') AS syms, c FROM s$i) x,
        |       unnest(generate_series(1, len(x.syms) - 1)) AS u(i)),
        |b$i AS (SELECT CAST($i AS BIGINT) AS step, pair,
        |    CAST(sum(c) AS BIGINT) AS cnt
        |  FROM pr$i GROUP BY pair ORDER BY sum(c) DESC, pair LIMIT 1),
        |s${i + 1} AS (SELECT s.tok,
        |    CASE WHEN b.pair IS NULL THEN s.seg
        |         ELSE replace(s.seg, ' ' || b.pair || ' ',
        |              ' ' || replace(b.pair, ' ', '') || ' ') END AS seg, s.c
        |  FROM s$i s LEFT JOIN b$i b ON TRUE)""".stripMargin
    }
    sb.toString
  }

  private def bpeOracle(k: Int): String =
    "WITH " + bpeCtes(k) + "\nSELECT step, pair, cnt FROM (" +
      (0 until k).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ") +
      ") ORDER BY step"

  /** Encode oracle (t17): join every document token to its trained
    * segmentation (s_k) and count pieces; tokenless docs emit 0/0. */
  private def bpeEncodeOracle(k: Int): String =
    "WITH " + bpeCtes(k) +
      s""",
        |dtoks AS (SELECT doc_id AS id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                       x -> len(x) > 0)) AS tok
        |  FROM documents),
        |enc AS (SELECT d.id, count(*) AS n_tokens,
        |    CAST(sum(len(string_split(trim(s.seg), ' '))) AS BIGINT) AS n_pieces
        |  FROM dtoks d JOIN s$k s USING (tok) GROUP BY d.id)
        |SELECT doc_id AS id,
        |  CAST(coalesce(enc.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(enc.n_pieces, 0) AS BIGINT) AS n_pieces
        |FROM documents LEFT JOIN enc ON documents.doc_id = enc.id
        |ORDER BY id""".stripMargin

  /** Decode oracle (t21): decode every token's trained segmentation
    * (strip sentinels + separators), reassemble in token-position
    * order, and compare against the independently-normalized original
    * — mirrors TextOps.bpeDecodeRoundTrip stage by stage. */
  private def bpeDecodeOracle(k: Int): String =
    "WITH " + bpeCtes(k) +
      s""",
        |dt AS (SELECT doc_id AS id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> len(x) > 0) AS ts
        |  FROM documents),
        |dtoks AS (SELECT id, u.i AS pos, ts[u.i] AS tok
        |  FROM dt, unnest(generate_series(1, len(ts))) AS u(i)),
        |dec AS (SELECT tok, replace(trim(seg), ' ', '') AS dec,
        |    len(string_split(trim(seg), ' ')) AS np FROM s$k),
        |enc AS (SELECT d.id,
        |    string_agg(dec.dec, ' ' ORDER BY d.pos) AS decoded,
        |    CAST(sum(dec.np) AS BIGINT) AS n_pieces
        |  FROM dtoks d JOIN dec USING (tok) GROUP BY d.id),
        |nrm AS (SELECT id, array_to_string(ts, ' ') AS norm_text FROM dt)
        |SELECT nrm.id AS id,
        |  CAST(coalesce(enc.n_pieces, 0) AS BIGINT) AS n_pieces,
        |  coalesce(enc.decoded, '') AS decoded,
        |  CAST(CASE WHEN coalesce(enc.decoded, '') = nrm.norm_text
        |       THEN 1 ELSE 0 END AS BIGINT) AS round_trip_ok
        |FROM nrm LEFT JOIN enc ON nrm.id = enc.id
        |ORDER BY nrm.id""".stripMargin

  /** Artifact-encode oracle (t26/sw23): train the merges on the
    * `trainWhere` sub-corpus (bpeCtes' b-CTEs), then REPLAY them over
    * the serve corpus's own distinct tokens (e-CTEs — the same
    * left-to-right literal replace, unrolled per merge round) and
    * count pieces per serve document. Mirrors
    * TextOps.bpeEncodeFromArtifact stage by stage, including the OOV
    * contract: serve tokens the trainer never saw still segment under
    * the replayed merges. */
  private[queries] def bpeArtifactEncodeOracle(k: Int, trainWhere: String,
      serveWhere: String = ""): String = {
    val sw = if (serveWhere.isEmpty) "" else s" WHERE $serveWhere"
    val replay = (0 until k).map { i =>
      s"""e${i + 1} AS (SELECT e.tok,
        |    CASE WHEN b.pair IS NULL THEN e.seg
        |         ELSE replace(e.seg, ' ' || b.pair || ' ',
        |              ' ' || replace(b.pair, ' ', '') || ' ') END AS seg
        |  FROM e$i e LEFT JOIN b$i b ON TRUE)""".stripMargin
    }.mkString(",\n")
    "WITH " + bpeCtes(k, trainWhere) +
      s""",
        |dtoks AS (SELECT doc_id AS id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                       x -> len(x) > 0)) AS tok
        |  FROM documents$sw),
        |e0 AS (SELECT tok, ' ' || array_to_string(
        |    list_transform(generate_series(1, len(tok)), i -> substr(tok, i, 1)),
        |    ' ') || ' ' AS seg FROM (SELECT DISTINCT tok FROM dtoks)),
        |$replay,
        |enc AS (SELECT d.id, count(*) AS n_tokens,
        |    CAST(sum(len(string_split(trim(s.seg), ' '))) AS BIGINT) AS n_pieces
        |  FROM dtoks d JOIN e$k s USING (tok) GROUP BY d.id)
        |SELECT doc_id AS id,
        |  CAST(coalesce(enc.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(enc.n_pieces, 0) AS BIGINT) AS n_pieces
        |FROM documents LEFT JOIN enc ON documents.doc_id = enc.id$sw
        |ORDER BY id""".stripMargin
  }

  /** Vocab-extension oracle (t27): k rounds train on `trainWhere`
    * (bpeCtes' b-CTEs), then the extension corpus's frequency table
    * (`extWhere`) is segmented by replaying those frozen merges
    * (x-CTEs) and `k2` continued rounds train on it (b_k..b_{k+k2-1})
    * — mirrors TextOps.extendBpeArtifact round for round. Emits the
    * full extended merge table. */
  private def bpeExtendOracle(k: Int, k2: Int, trainWhere: String,
      extWhere: String): String = {
    val replay = (0 until k).map { i =>
      s"""x${i + 1} AS (SELECT x.tok,
        |    CASE WHEN b.pair IS NULL THEN x.seg
        |         ELSE replace(x.seg, ' ' || b.pair || ' ',
        |              ' ' || replace(b.pair, ' ', '') || ' ') END AS seg, x.c
        |  FROM x$i x LEFT JOIN b$i b ON TRUE)""".stripMargin
    }.mkString(",\n")
    val cont = (0 until k2).map { j =>
      val i = k + j
      s"""xp$i AS (SELECT y.syms[u.i] || ' ' || y.syms[u.i + 1] AS pair, y.c
        |  FROM (SELECT string_split(trim(seg), ' ') AS syms, c FROM x$i) y,
        |       unnest(generate_series(1, len(y.syms) - 1)) AS u(i)),
        |b$i AS (SELECT CAST($i AS BIGINT) AS step, pair,
        |    CAST(sum(c) AS BIGINT) AS cnt
        |  FROM xp$i GROUP BY pair ORDER BY sum(c) DESC, pair LIMIT 1),
        |x${i + 1} AS (SELECT x.tok,
        |    CASE WHEN b.pair IS NULL THEN x.seg
        |         ELSE replace(x.seg, ' ' || b.pair || ' ',
        |              ' ' || replace(b.pair, ' ', '') || ' ') END AS seg, x.c
        |  FROM x$i x LEFT JOIN b$i b ON TRUE)""".stripMargin
    }.mkString(",\n")
    "WITH " + bpeCtes(k, trainWhere) +
      s""",
        |toks2 AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            x -> len(x) > 0)) AS tok
        |  FROM documents WHERE $extWhere),
        |tf2 AS (SELECT tok, count(*) AS c FROM toks2 GROUP BY tok),
        |x0 AS (SELECT tok, ' ' || array_to_string(
        |    list_transform(generate_series(1, len(tok)), i -> substr(tok, i, 1)),
        |    ' ') || ' ' AS seg, c FROM tf2),
        |$replay,
        |$cont
        |SELECT step, pair, cnt FROM (""".stripMargin +
      (0 until k + k2).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ") +
      ") ORDER BY step"
  }

  private[queries] def MhHashes = 16
  private[queries] def MhBands = 4
  private def NdBits = 60
  private def NdBands = 15
  private[queries] def IvfLists = 16
  private[queries] def IvfProbes = 4
  private[queries] def PqM = 4
  private[queries] def PqK = 16
  private[queries] def PqSeed = 11L
  private def KmvK = 64

  /** Shared CTE chain for the PQ queries (s07/s08): codebooks inlined
    * as double literals (cb: j 0-based subspace, ci 1-based code,
    * c vector, cc2 self-dot), corpus rows encoded to `pq(vec_id,
    * codes, mse)` — mirrors Similarity.pqEncode stage by stage
    * (first-minimum argmin, errors summed in subspace order). */
  private def pqCodesCtes: String = {
    val dim = 64
    val sub = dim / PqM
    val books = graft.similarity.Similarity.pqCodebooks(dim, PqM, PqK, PqSeed)
    val cbSql = books.zipWithIndex.flatMap { case (codes, j) =>
      codes.zipWithIndex.map { case (c, ci) =>
        val lst = c.map(f => java.lang.Double.toString(f.toDouble))
          .mkString("[", ", ", "]")
        val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
        s"SELECT $j AS j, ${ci + 1} AS ci, CAST($lst AS DOUBLE[]) AS c, " +
          s"CAST($self AS DOUBLE) AS cc2"
      }
    }.mkString("\n  UNION ALL ")
    s"""cb AS (
       |  $cbSql),
       |e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |dists AS (SELECT e.vec_id, cb.j, cb.ci,
       |    -2.0 * list_sum(list_transform(generate_series(1, $sub),
       |        i -> e.v[cb.j * $sub + i] * cb.c[i])) + cb.cc2 AS d,
       |    list_sum(list_transform(generate_series(1, $sub),
       |        i -> e.v[cb.j * $sub + i] * e.v[cb.j * $sub + i])) AS xx
       |  FROM e CROSS JOIN cb),
       |code AS (SELECT vec_id, j, ci AS code, d + xx AS err FROM (
       |    SELECT vec_id, j, ci, d, xx, row_number() OVER (
       |      PARTITION BY vec_id, j ORDER BY d, ci) AS rn
       |    FROM dists) WHERE rn = 1),
       |pq AS (SELECT vec_id, list(CAST(code AS INT) ORDER BY j) AS codes,
       |    list_sum(list(err ORDER BY j)) / $dim.0 AS mse
       |  FROM code GROUP BY vec_id)""".stripMargin
  }

  /** Per-subspace ADC term (s08): ‖q_j − c‖² against the joined
    * selected-code row — same expression order as pqAdcTopK's distJ. */
  private def pqAdcTermSql: String = {
    val sub = 64 / PqM
    s"""list_sum(list_transform(generate_series(1, $sub),
       |        i -> q.qv[cb.j * $sub + i] * q.qv[cb.j * $sub + i]))
       |      - 2.0 * list_sum(list_transform(generate_series(1, $sub),
       |        i -> q.qv[cb.j * $sub + i] * cb.c[i])) + cb.cc2""".stripMargin
  }

  /** Unrolled greedy MMR (s09): step CTE s_i cross-joins the corpus
    * with every already-selected row and takes the (rounded score
    * desc, id) argmax — mirroring Similarity.mmrTopK step by step.
    * λ and 1−λ are emitted via Double.toString so the oracle computes
    * with the IDENTICAL doubles (1−0.7 is NOT the double 0.3). */
  private def mmrOracle(k: Int, lambda: Double): String = {
    val lam = java.lang.Double.toString(lambda)
    val oneMinus = java.lang.Double.toString(1 - lambda)
    def simTo(i: Int) = s"${dotSql("b.v", s"s$i.v")} / (b.nrm * s$i.nrm)"
    val steps = (1 to k).map { i =>
      if (i == 1)
        s"""s1 AS (SELECT id, v, nrm, score FROM (
           |    SELECT id, v, nrm, round($lam * qcos, 6) AS score,
           |      row_number() OVER (
           |        ORDER BY round($lam * qcos, 6) DESC, id) AS rn
           |    FROM base) WHERE rn = 1)""".stripMargin
      else {
        val joins = (1 until i).map(j => s"CROSS JOIN s$j").mkString(" ")
        val excl = (1 until i).map(j => s"b.id <> s$j.id").mkString(" AND ")
        val sims = (1 until i).map(simTo)
        val maxSim = if (sims.size == 1) sims.head
          else s"greatest(${sims.mkString(", ")})"
        s"""s$i AS (SELECT id, v, nrm, score FROM (
           |    SELECT id, v, nrm, score,
           |      row_number() OVER (ORDER BY score DESC, id) AS rn
           |    FROM (
           |      SELECT b.id, b.v, b.nrm,
           |        round($lam * b.qcos - $oneMinus * ($maxSim), 6) AS score
           |      FROM base b $joins WHERE $excl)) WHERE rn = 1)""".stripMargin
      }
    }.mkString(",\n")
    val out = (1 to k)
      .map(i => s"SELECT $i AS pos, id, score FROM s$i")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT v AS qv, sqrt(${dotSql("v", "v")}) AS qn
       |      FROM e WHERE vec_id = 0),
       |base AS (SELECT e.vec_id AS id, e.v,
       |    sqrt(${dotSql("e.v", "e.v")}) AS nrm,
       |    ${dotSql("e.v", "q.qv")} / (sqrt(${dotSql("e.v", "e.v")}) * q.qn)
       |      AS qcos
       |  FROM e CROSS JOIN q),
       |$steps
       |SELECT pos, id, score FROM (
       |  $out) ORDER BY pos""".stripMargin
  }

  /** Shared KMV sketch CTEs (p09/p10): distinct 52-bit md5 content
    * hashes per source, ranked ascending, kept to the k smallest —
    * mirrors text.Sketches.bottomK. */
  private def kmvSketchCtes: String =
    s"""h AS (SELECT DISTINCT source,
       |    CAST('0x' || substr(md5(text), 1, 13) AS BIGINT) AS h
       |  FROM documents),
       |r AS (SELECT source, h, row_number() OVER (
       |    PARTITION BY source ORDER BY h) AS rn FROM h),
       |sk AS (SELECT source, h, rn FROM r WHERE rn <= $KmvK)""".stripMargin

  /** Generated oracle for the fixed-centroid IVF ANN: centroids (and
    * their precomputed self-dots) inlined as double literals, corpus
    * assigned to the argmin list, queries probe their nprobe nearest
    * lists, candidates ranked by exact cosine — mirroring
    * Similarity.ivfFixedTopK stage by stage. */
  private[queries] def ivfFixedOracle(dim: Int, nlist: Int, nprobe: Int, k: Int,
      seed: Long): String = {
    val cents = graft.similarity.Similarity.hyperplanes(dim, nlist, seed)
    val centsSql = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(f => java.lang.Double.toString(f.toDouble))
        .mkString("[", ", ", "]")
      val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
      s"SELECT $j AS j, CAST($lst AS DOUBLE[]) AS c, CAST($self AS DOUBLE) AS cc2"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cents AS (
       |  $centsSql),
       |nrm AS (SELECT vec_id, sqrt(${dotSql("v", "v")}) AS nm FROM e),
       |dists AS (SELECT e.vec_id, cents.j,
       |    -2.0 * ${dotSql("e.v", "cents.c")} + cents.cc2 AS d
       |  FROM e CROSS JOIN cents),
       |assign AS (SELECT vec_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM dists) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM dists WHERE vec_id < 20) WHERE rn <= $nprobe),
       |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(${dotSql("eq.v", "ec.v")} / (nq.nm * nc.nm), 6) AS cos
       |  FROM probes p JOIN assign a ON p.cluster = a.cluster
       |    AND p.query_id <> a.vec_id
       |  JOIN e eq ON p.query_id = eq.vec_id JOIN e ec ON a.vec_id = ec.vec_id
       |  JOIN nrm nq ON p.query_id = nq.vec_id JOIN nrm nc ON a.vec_id = nc.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for s23 filtered search: the ivfFixedOracle chain with the
    * metadata predicate (over the embeddings row aliased `l`) applied
    * to the assignment CTE before scoring — exactly where
    * Similarity.ivfFilteredTopK applies it. */
  private def ivfFilteredOracle(dim: Int, nlist: Int, nprobe: Int, k: Int,
      seed: Long, predSql: String): String =
    s"""${ivfFilteredCtes(dim, nlist, nprobe, seed, predSql)}
       |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Oracle for s29 index deletes: the filtered chain (predicate = the
    * non-deleted rows) emitted under BOTH phase tags — tombstoned
    * serve and post-compaction serve must each equal the
    * built-without-deletes index's results. */
  private def ivfTombstoneOracle(dim: Int, nlist: Int, nprobe: Int, k: Int,
      seed: Long, predSql: String): String =
    s"""${ivfFilteredCtes(dim, nlist, nprobe, seed, predSql)}
       |SELECT ph.phase, r.query_id, r.neighbor_id, r.cos, r.rank
       |FROM ranked r CROSS JOIN (SELECT 1 AS phase UNION ALL SELECT 2 AS phase) ph
       |WHERE r.rank <= $k
       |ORDER BY ph.phase, r.query_id, r.rank""".stripMargin

  private def ivfFilteredCtes(dim: Int, nlist: Int, nprobe: Int,
      seed: Long, predSql: String): String = {
    val cents = graft.similarity.Similarity.hyperplanes(dim, nlist, seed)
    val centsSql = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(f => java.lang.Double.toString(f.toDouble))
        .mkString("[", ", ", "]")
      val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
      s"SELECT $j AS j, CAST($lst AS DOUBLE[]) AS c, CAST($self AS DOUBLE) AS cc2"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cents AS (
       |  $centsSql),
       |nrm AS (SELECT vec_id, sqrt(${dotSql("v", "v")}) AS nm FROM e),
       |dists AS (SELECT e.vec_id, cents.j,
       |    -2.0 * ${dotSql("e.v", "cents.c")} + cents.cc2 AS d
       |  FROM e CROSS JOIN cents),
       |assign AS (SELECT vec_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM dists) WHERE rn = 1),
       |fassign AS (SELECT a.vec_id, a.cluster FROM assign a
       |  JOIN embeddings l ON a.vec_id = l.vec_id WHERE $predSql),
       |probes AS (SELECT vec_id AS query_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM dists WHERE vec_id < 20) WHERE rn <= $nprobe),
       |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(${dotSql("eq.v", "ec.v")} / (nq.nm * nc.nm), 6) AS cos
       |  FROM probes p JOIN fassign a ON p.cluster = a.cluster
       |    AND p.query_id <> a.vec_id
       |  JOIN e eq ON p.query_id = eq.vec_id JOIN e ec ON a.vec_id = ec.vec_id
       |  JOIN nrm nq ON p.query_id = nq.vec_id JOIN nrm nc ON a.vec_id = nc.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)""".stripMargin
  }

  /** Oracle for d25 SemDeDup: the ivfFixedOracle assign chain
    * (centroids inlined) + the within-cell lower-id-neighbor drop
    * rule replayed as a cell-keyed self-join. */
  private def semDedupOracle(dim: Int, nlist: Int, minCos: Double,
      seed: Long): String = {
    val cents = graft.similarity.Similarity.hyperplanes(dim, nlist, seed)
    val centsSql = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(f => java.lang.Double.toString(f.toDouble))
        .mkString("[", ", ", "]")
      val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
      s"SELECT $j AS j, CAST($lst AS DOUBLE[]) AS c, CAST($self AS DOUBLE) AS cc2"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cents AS (
       |  $centsSql),
       |nrm AS (SELECT vec_id, sqrt(${dotSql("v", "v")}) AS nm FROM e),
       |dists AS (SELECT e.vec_id, cents.j,
       |    -2.0 * ${dotSql("e.v", "cents.c")} + cents.cc2 AS d
       |  FROM e CROSS JOIN cents),
       |assign AS (SELECT vec_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM dists) WHERE rn = 1),
       |dropped AS (SELECT DISTINCT b.vec_id
       |  FROM assign a JOIN assign b ON a.cluster = b.cluster
       |    AND a.vec_id < b.vec_id
       |  JOIN e ea ON a.vec_id = ea.vec_id JOIN e eb ON b.vec_id = eb.vec_id
       |  JOIN nrm na ON a.vec_id = na.vec_id JOIN nrm nb ON b.vec_id = nb.vec_id
       |  WHERE round(${dotSql("ea.v", "eb.v")} / (na.nm * nb.nm), 6) >= $minCos)
       |SELECT a.vec_id AS id, a.cluster FROM assign a
       |WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY id""".stripMargin
  }

  /** Oracle for p17 AND its streaming twin sw12: full count-min cell
    * replay (salted-md5 row hashes) + exact-top-20 probe audit. */
  private[queries] def cmsOracle: String =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                            x -> len(x) > 0)) AS tok
      |  FROM documents),
      |cells AS (SELECT r.i AS r,
      |    CAST(CAST('0x' || substr(md5('cms' || r.i || '|' || tok), 1, 13)
      |      AS BIGINT) % 256 AS INT) AS c
      |  FROM toks, unnest(generate_series(0, 3)) AS r(i)),
      |sketch AS (SELECT r, c, count(*) AS cell_cnt FROM cells GROUP BY r, c),
      |tf AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |top AS (SELECT tok, cnt FROM tf ORDER BY cnt DESC, tok LIMIT 20),
      |probes AS (SELECT t.tok, t.cnt, r.i AS r,
      |    CAST(CAST('0x' || substr(md5('cms' || r.i || '|' || t.tok), 1, 13)
      |      AS BIGINT) % 256 AS INT) AS c
      |  FROM top t, unnest(generate_series(0, 3)) AS r(i))
      |SELECT p.tok, CAST(p.cnt AS BIGINT) AS true_cnt,
      |  CAST(min(s.cell_cnt) AS BIGINT) AS cms_est
      |FROM probes p JOIN sketch s ON p.r = s.r AND p.c = s.c
      |GROUP BY p.tok, p.cnt
      |ORDER BY true_cnt DESC, tok""".stripMargin

  /** Shared CTE chain for the COMPOSED IVF-PQ queries (s18/s19/s20):
    * the pqCodesCtes codebook/encode chain plus the ivfFixedOracle
    * centroid/assign/probe chain (IVF CTEs renamed icents/idists to
    * avoid the pq `dists` collision), composed exactly as
    * Similarity.ivfPqTopK: candidates are rows of the PROBED lists,
    * scored by the ADC term against the joined selected-code rows.
    * Ends at `ranked` (query_id, neighbor_id, adc_dist, rank). */
  private def ivfPqCtes(dim: Int, nlist: Int, nprobe: Int,
      ivfSeed: Long, candWhere: String = "TRUE",
      queryWhere: String = "vec_id < 20"): String = {
    val cents = graft.similarity.Similarity.hyperplanes(dim, nlist, ivfSeed)
    val centsSql = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(f => java.lang.Double.toString(f.toDouble))
        .mkString("[", ", ", "]")
      val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
      s"SELECT $j AS j, CAST($lst AS DOUBLE[]) AS c, CAST($self AS DOUBLE) AS cc2"
    }.mkString("\n  UNION ALL ")
    s"""$pqCodesCtes,
       |icents AS (
       |  $centsSql),
       |idists AS (SELECT e.vec_id, icents.j,
       |    -2.0 * ${dotSql("e.v", "icents.c")} + icents.cc2 AS d
       |  FROM e CROSS JOIN icents),
       |iassign AS (SELECT vec_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM idists) WHERE rn = 1),
       |iprobes AS (SELECT vec_id AS query_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM idists WHERE $queryWhere) WHERE rn <= $nprobe),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE $queryWhere),
       |adists AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(list_sum(list(
       |      ${pqAdcTermSql} ORDER BY cb.j)), 6) AS adc_dist
       |  FROM iprobes p
       |  JOIN iassign a ON p.cluster = a.cluster AND p.query_id <> a.vec_id
       |  JOIN pq ON pq.vec_id = a.vec_id
       |  JOIN q ON q.query_id = p.query_id
       |  JOIN cb ON cb.ci = pq.codes[cb.j + 1]
       |  WHERE $candWhere
       |  GROUP BY p.query_id, a.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, adc_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, neighbor_id) AS rank
       |  FROM adists)""".stripMargin
  }

  /** s26 oracle: [[ivfPqOracle]] with the candidate-side metadata
    * predicate applied before ADC scoring (an IN-subquery over the
    * base table — one hash semi-join in DuckDB, mirroring the engine's
    * pushed-down filter on the coded frame). */
  private def ivfPqFilteredOracle(dim: Int, nlist: Int, nprobe: Int,
      topK: Int, ivfSeed: Long, predSql: String): String =
    s"""WITH ${ivfPqCtes(dim, nlist, nprobe, ivfSeed,
         s"a.vec_id IN (SELECT vec_id FROM embeddings WHERE $predSql)")}
       |SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin

  /** Sweep oracle for s21: the ivfPqCtes machinery with probe ranks
    * NOT cut (ipranks), an exact-Euclidean baseline CTE, and a
    * scored→apx→rec→agg chain PER probe count, unioned — the
    * ivfProbeSweepOracle pattern on the composed index. */
  private def ivfPqProbeSweepOracle(dim: Int, nlist: Int, topK: Int,
      nprobes: Seq[Int], ivfSeed: Long): String = {
    val cents = graft.similarity.Similarity.hyperplanes(dim, nlist, ivfSeed)
    val centsSql = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(f => java.lang.Double.toString(f.toDouble))
        .mkString("[", ", ", "]")
      val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
      s"SELECT $j AS j, CAST($lst AS DOUBLE[]) AS c, CAST($self AS DOUBLE) AS cc2"
    }.mkString("\n  UNION ALL ")
    val shared =
      s"""WITH $pqCodesCtes,
         |icents AS (
         |  $centsSql),
         |idists AS (SELECT e.vec_id, icents.j,
         |    -2.0 * ${dotSql("e.v", "icents.c")} + icents.cc2 AS d
         |  FROM e CROSS JOIN icents),
         |iassign AS (SELECT vec_id, j + 1 AS cluster FROM (
         |    SELECT vec_id, j, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d, j) AS rn
         |    FROM idists) WHERE rn = 1),
         |ipranks AS (SELECT vec_id AS query_id, j + 1 AS cluster,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS pr
         |  FROM idists WHERE vec_id < 20),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
         |bn AS (SELECT vec_id, ${dotSql("v", "v")} AS nn2 FROM e),
         |bscored AS (SELECT eq.vec_id AS query_id, ec.vec_id AS neighbor_id,
         |    round(sqrt(greatest(nq.nn2 - 2 * ${dotSql("eq.v", "ec.v")}
         |      + nc.nn2, 0.0)), 6) AS dist
         |  FROM e eq JOIN e ec ON eq.vec_id < 20 AND eq.vec_id <> ec.vec_id
         |  JOIN bn nq ON eq.vec_id = nq.vec_id
         |  JOIN bn nc ON ec.vec_id = nc.vec_id),
         |bex AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |    FROM bscored) WHERE rank <= $topK)""".stripMargin
    val perNp = nprobes.map { np =>
      s""",
         |adists_$np AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |    round(list_sum(list(
         |      ${pqAdcTermSql} ORDER BY cb.j)), 6) AS adc_dist
         |  FROM ipranks p
         |  JOIN iassign a ON p.cluster = a.cluster
         |    AND p.query_id <> a.vec_id AND p.pr <= $np
         |  JOIN pq ON pq.vec_id = a.vec_id
         |  JOIN q ON q.query_id = p.query_id
         |  JOIN cb ON cb.ci = pq.codes[cb.j + 1]
         |  GROUP BY p.query_id, a.vec_id),
         |apx_$np AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
         |    FROM adists_$np) WHERE rank <= $topK),
         |rec_$np AS (SELECT bex.query_id, count(apx_$np.neighbor_id) AS n_hits
         |  FROM bex LEFT JOIN apx_$np
         |    ON bex.query_id = apx_$np.query_id
         |    AND bex.neighbor_id = apx_$np.neighbor_id
         |  GROUP BY bex.query_id),
         |agg_$np AS (SELECT CAST($np AS BIGINT) AS nprobe,
         |    count(*) AS n_queries, CAST(sum(n_hits) AS BIGINT) AS total_hits,
         |    CAST(min(n_hits) AS BIGINT) AS min_hits,
         |    round(sum(n_hits) / ($topK.0 * count(*)), 4) AS avg_recall
         |  FROM rec_$np)""".stripMargin
    }.mkString
    shared + perNp + "\nSELECT * FROM (" +
      nprobes.map(np => s"SELECT * FROM agg_$np").mkString(" UNION ALL ") +
      ") ORDER BY nprobe"
  }

  /** Oracle for s22 RESIDUAL IVF-PQ: the ivfPq machinery with PQ codes
    * assigned over RESIDUALS v − centroid(cluster) and the query side
    * ADC-scoring its per-probed-list residual. Residual subtraction is
    * replayed at FLOAT precision (CAST ... AS REAL) because the Spark
    * side subtracts float arrays — float subtraction is correctly
    * rounded identically whether computed natively or as
    * double-subtract-then-round, so the residual arrays are bit-equal
    * cross-engine; all sums then widen to double as usual. */
  private def ivfPqResidualOracle(dim: Int, nlist: Int, nprobe: Int,
      topK: Int, ivfSeed: Long): String = {
    val sub = dim / PqM
    val cents = graft.similarity.Similarity.hyperplanes(dim, nlist, ivfSeed)
    val centsSql = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(f => java.lang.Double.toString(f.toDouble))
        .mkString("[", ", ", "]")
      val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
      s"SELECT $j AS j, CAST($lst AS DOUBLE[]) AS c, CAST($self AS DOUBLE) AS cc2"
    }.mkString("\n  UNION ALL ")
    val books = graft.similarity.Similarity.pqCodebooks(dim, PqM, PqK, PqSeed)
    val cbSql = books.zipWithIndex.flatMap { case (codes, j) =>
      codes.zipWithIndex.map { case (c, ci) =>
        val lst = c.map(f => java.lang.Double.toString(f.toDouble))
          .mkString("[", ", ", "]")
        val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
        s"SELECT $j AS j, ${ci + 1} AS ci, CAST($lst AS DOUBLE[]) AS c, " +
          s"CAST($self AS DOUBLE) AS cc2"
      }
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cb AS (
       |  $cbSql),
       |icents AS (
       |  $centsSql),
       |idists AS (SELECT e.vec_id, icents.j,
       |    -2.0 * ${dotSql("e.v", "icents.c")} + icents.cc2 AS d
       |  FROM e CROSS JOIN icents),
       |iassign AS (SELECT vec_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM idists) WHERE rn = 1),
       |resid AS (SELECT a.vec_id, a.cluster,
       |    list_transform(generate_series(1, $dim),
       |      i -> CAST(CAST(CAST(e.v[i] AS REAL) - CAST(ic.c[i] AS REAL)
       |        AS REAL) AS DOUBLE)) AS rv
       |  FROM iassign a JOIN e ON a.vec_id = e.vec_id
       |  JOIN icents ic ON ic.j + 1 = a.cluster),
       |rdists AS (SELECT r.vec_id, cb.j, cb.ci,
       |    -2.0 * list_sum(list_transform(generate_series(1, $sub),
       |        i -> r.rv[cb.j * $sub + i] * cb.c[i])) + cb.cc2 AS d
       |  FROM resid r CROSS JOIN cb),
       |rcode AS (SELECT vec_id, j, ci AS code FROM (
       |    SELECT vec_id, j, ci, row_number() OVER (
       |      PARTITION BY vec_id, j ORDER BY d, ci) AS rn
       |    FROM rdists) WHERE rn = 1),
       |rpq AS (SELECT vec_id, list(CAST(code AS INT) ORDER BY j) AS codes
       |  FROM rcode GROUP BY vec_id),
       |iprobes AS (SELECT vec_id AS query_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM idists WHERE vec_id < 20) WHERE rn <= $nprobe),
       |qres AS (SELECT p.query_id, p.cluster,
       |    list_transform(generate_series(1, $dim),
       |      i -> CAST(CAST(CAST(e.v[i] AS REAL) - CAST(ic.c[i] AS REAL)
       |        AS REAL) AS DOUBLE)) AS qrv
       |  FROM iprobes p JOIN e ON e.vec_id = p.query_id
       |  JOIN icents ic ON ic.j + 1 = p.cluster),
       |adists AS (SELECT q.query_id, a.vec_id AS neighbor_id,
       |    round(list_sum(list(
       |      list_sum(list_transform(generate_series(1, $sub),
       |        i -> q.qrv[cb.j * $sub + i] * q.qrv[cb.j * $sub + i]))
       |      - 2.0 * list_sum(list_transform(generate_series(1, $sub),
       |        i -> q.qrv[cb.j * $sub + i] * cb.c[i])) + cb.cc2
       |      ORDER BY cb.j)), 6) AS adc_dist
       |  FROM qres q
       |  JOIN iassign a ON a.cluster = q.cluster AND q.query_id <> a.vec_id
       |  JOIN rpq ON rpq.vec_id = a.vec_id
       |  JOIN cb ON cb.ci = rpq.codes[cb.j + 1]
       |  GROUP BY q.query_id, a.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, adc_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, neighbor_id) AS rank
       |  FROM adists)
       |SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for s18/s19: the ivfPqCtes chain cut at top-k. */
  private[queries] def ivfPqOracle(dim: Int, nlist: Int, nprobe: Int, topK: Int,
      ivfSeed: Long): String =
    s"""WITH ${ivfPqCtes(dim, nlist, nprobe, ivfSeed)}
       |SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin

  /** Oracle for sw11 streaming semantic admission: benchmark rows
    * (vec_id%10=0) assigned to their fixed-centroid lists, stream rows
    * (vec_id%10≠0) probe their nprobe nearest lists, and a stream row
    * is ADMITTED iff no benchmark neighbor within its probed lists
    * reaches cosine `minCos` — the batch replay of
    * EventStreams.semanticAdmission over the same split. */
  private[queries] def semanticAdmissionIvfOracle(dim: Int, nlist: Int,
      nprobe: Int, minCos: Double, seed: Long): String = {
    val cents = graft.similarity.Similarity.hyperplanes(dim, nlist, seed)
    val centsSql = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(f => java.lang.Double.toString(f.toDouble))
        .mkString("[", ", ", "]")
      val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
      s"SELECT $j AS j, CAST($lst AS DOUBLE[]) AS c, CAST($self AS DOUBLE) AS cc2"
    }.mkString("\n  UNION ALL ")
    val cosThr = java.lang.Double.toString(minCos)
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cents AS (
       |  $centsSql),
       |nrm AS (SELECT vec_id, sqrt(${dotSql("v", "v")}) AS nm FROM e),
       |dists AS (SELECT e.vec_id, cents.j,
       |    -2.0 * ${dotSql("e.v", "cents.c")} + cents.cc2 AS d
       |  FROM e CROSS JOIN cents),
       |assign AS (SELECT vec_id, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM dists WHERE vec_id % 10 = 0) WHERE rn = 1),
       |probes AS (SELECT vec_id AS qid, j + 1 AS cluster FROM (
       |    SELECT vec_id, j, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d, j) AS rn
       |    FROM dists WHERE vec_id % 10 != 0) WHERE rn <= $nprobe),
       |flagged AS (SELECT DISTINCT p.qid FROM probes p
       |  JOIN assign a ON p.cluster = a.cluster
       |  JOIN e eq ON eq.vec_id = p.qid JOIN e ec ON ec.vec_id = a.vec_id
       |  JOIN nrm nq ON nq.vec_id = p.qid JOIN nrm nc ON nc.vec_id = a.vec_id
       |  WHERE round(${dotSql("eq.v", "ec.v")} / (nq.nm * nc.nm), 6) >= $cosThr)
       |SELECT vec_id AS id FROM e
       |WHERE vec_id % 10 != 0 AND vec_id NOT IN (SELECT qid FROM flagged)
       |ORDER BY vec_id""".stripMargin
  }

  /** Sweep oracle for s14: the ivfFixedOracle CTE chain (shared
    * centroid/assignment CTEs), an exact brute-force top-k CTE, and a
    * probes→scored→ranked→recall chain PER probe count, unioned. */
  private def ivfProbeSweepOracle(dim: Int, nlist: Int, k: Int,
      nprobes: Seq[Int], seed: Long): String = {
    val cents = graft.similarity.Similarity.hyperplanes(dim, nlist, seed)
    val centsSql = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(f => java.lang.Double.toString(f.toDouble))
        .mkString("[", ", ", "]")
      val self = java.lang.Double.toString(c.map(x => x.toDouble * x).sum)
      s"SELECT $j AS j, CAST($lst AS DOUBLE[]) AS c, CAST($self AS DOUBLE) AS cc2"
    }.mkString("\n  UNION ALL ")
    val shared =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (
         |  $centsSql),
         |nrm AS (SELECT vec_id, sqrt(${dotSql("v", "v")}) AS nm FROM e),
         |dists AS (SELECT e.vec_id, cents.j,
         |    -2.0 * ${dotSql("e.v", "cents.c")} + cents.cc2 AS d
         |  FROM e CROSS JOIN cents),
         |assign AS (SELECT vec_id, j + 1 AS cluster FROM (
         |    SELECT vec_id, j, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d, j) AS rn
         |    FROM dists) WHERE rn = 1),
         |pranks AS (SELECT vec_id AS query_id, j + 1 AS cluster,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS pr
         |  FROM dists WHERE vec_id < 20),
         |bscored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(${dotSql("q.v", "c.v")} / (nq.nm * nc.nm), 6) AS cos
         |  FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
         |  JOIN nrm nq ON q.vec_id = nq.vec_id
         |  JOIN nrm nc ON c.vec_id = nc.vec_id),
         |bex AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM bscored) WHERE rank <= $k)""".stripMargin
    val perNp = nprobes.map { np =>
      s""",
         |scored_$np AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |    round(${dotSql("eq.v", "ec.v")} / (nq.nm * nc.nm), 6) AS cos
         |  FROM pranks p JOIN assign a ON p.cluster = a.cluster
         |    AND p.query_id <> a.vec_id AND p.pr <= $np
         |  JOIN e eq ON p.query_id = eq.vec_id JOIN e ec ON a.vec_id = ec.vec_id
         |  JOIN nrm nq ON p.query_id = nq.vec_id JOIN nrm nc ON a.vec_id = nc.vec_id),
         |apx_$np AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM scored_$np) WHERE rank <= $k),
         |rec_$np AS (SELECT bex.query_id, count(apx_$np.neighbor_id) AS n_hits
         |  FROM bex LEFT JOIN apx_$np
         |    ON bex.query_id = apx_$np.query_id
         |    AND bex.neighbor_id = apx_$np.neighbor_id
         |  GROUP BY bex.query_id),
         |agg_$np AS (SELECT CAST($np AS BIGINT) AS nprobe,
         |    count(*) AS n_queries, CAST(sum(n_hits) AS BIGINT) AS total_hits,
         |    CAST(min(n_hits) AS BIGINT) AS min_hits,
         |    round(sum(n_hits) / ($k.0 * count(*)), 4) AS avg_recall
         |  FROM rec_$np)""".stripMargin
    }.mkString
    shared + perNp + "\nSELECT * FROM (" +
      nprobes.map(np => s"SELECT * FROM agg_$np").mkString(" UNION ALL ") +
      ") ORDER BY nprobe"
  }

  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]))"

  /** Oracle for s15: the s01 rounded-cosine brute ranking replayed on
    * the full vectors (exact set) and on each `v[1:d]` slice. */
  private def truncRecallOracle(k: Int, dims: Seq[Int]): String = {
    // ranked top-k (query_id, neighbor_id) pairs over table `src`
    def ranked(src: String, name: String) =
      s"""${name}sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(${dotSql("q.v", "c.v")} /
         |      (sqrt(${dotSql("q.v", "q.v")}) * sqrt(${dotSql("c.v", "c.v")})),
         |      6) AS cos
         |  FROM $src q JOIN $src c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |$name AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM ${name}sc) WHERE rank <= $k)""".stripMargin
    val perDim = dims.map { d =>
      s"""e$d AS (SELECT vec_id, v[1:$d] AS v FROM e),
         |${ranked(s"e$d", s"a$d")},
         |h$d AS (SELECT ex.query_id, count(a$d.neighbor_id) AS n_hits
         |  FROM ex LEFT JOIN a$d ON ex.query_id = a$d.query_id
         |    AND ex.neighbor_id = a$d.neighbor_id
         |  GROUP BY ex.query_id),
         |r$d AS (SELECT CAST($d AS BIGINT) AS dim, count(*) AS n_queries,
         |  CAST(sum(n_hits) AS BIGINT) AS total_hits,
         |  CAST(min(n_hits) AS BIGINT) AS min_hits,
         |  round(sum(n_hits) / (count(*) * $k.0), 4) AS avg_recall
         |  FROM h$d)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${ranked("e", "ex")},
       |$perDim
       |SELECT dim, n_queries, total_hits, min_hits, avg_recall
       |FROM (${dims.map(d => s"SELECT * FROM r$d").mkString(" UNION ALL ")})
       |ORDER BY dim""".stripMargin
  }

  /** Seeded hyperplanes inlined as exact double literals
    * (Double.toString round-trips) — one SELECT per plane. */
  private def planesSql(dim: Int, nBits: Int, seed: Long): String =
    graft.similarity.Similarity.hyperplanes(dim, nBits, seed)
      .zipWithIndex.map { case (p, i) =>
        val lst = p.map(f => java.lang.Double.toString(f.toDouble))
          .mkString("[", ", ", "]")
        s"SELECT $i AS k, CAST($lst AS DOUBLE[]) AS p"
      }.mkString("\n  UNION ALL ")

  /** Composed oracle for the end-to-end curation pipeline (p03) —
    * the t01 quality CTEs, the t02 language-vote CASE, d07's dedup
    * window, and p01's split bucket, chained in the operator's order. */
  private def curationOracle(minQuality: Double, keepLangs: Seq[String]): String = {
    val scores = TextOps.langMarkers.map { case (lang, words) =>
      s"len(list_intersect(dt, ${sqlList(words)})) AS s_$lang"
    }.mkString(",\n    ")
    val names = TextOps.langMarkers.map(_._1)
    val best = names.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val chain = names.map(l => s"WHEN s_$l = $best THEN '$l'").mkString("\n      ")
    val langList = keepLangs.map(l => s"'$l'").mkString("(", ", ", ")")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                x -> len(x) > 0) AS toks,
       |    CASE WHEN len(text) = 0 THEN 0.0 ELSE
       |      (len(text) - len(regexp_replace(text, '[.,!?;:''"()\\[\\]{}-]', '', 'g')))::DOUBLE
       |      / len(text) END AS praw
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, text, toks, praw,
       |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
       |      len(list_filter(toks, x -> list_contains(${sqlList(TextOps.langMarkers.head._2)}, x)))::DOUBLE
       |      / len(toks) END AS swraw
       |  FROM t),
       |q AS (
       |  SELECT doc_id, text, list_distinct(toks) AS dt,
       |    round(greatest(least(
       |      least(len(text)::DOUBLE / 500.0, 1.0) * 0.4 +
       |      least(swraw * 5.0, 1.0) * 0.4 +
       |      (1.0 - least(praw * 5.0, 1.0)) * 0.2, 1.0), 0.0), 6) AS quality
       |  FROM r),
       |sc AS (SELECT doc_id, text, quality,
       |    $scores
       |  FROM q),
       |lid AS (SELECT doc_id, text, quality,
       |    CASE WHEN $best = 0 THEN 'und'
       |      $chain
       |      END AS pred_lang
       |  FROM sc),
       |filt AS (SELECT * FROM lid
       |         WHERE quality >= $minQuality AND pred_lang IN $langList),
       |ded AS (SELECT doc_id, quality, pred_lang, text, row_number() OVER (
       |    PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM filt)
       |SELECT doc_id AS id, quality, pred_lang,
       |  CASE WHEN CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 10 < 7 THEN 'train'
       |       WHEN CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 10 < 8 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM ded WHERE rn = 1
       |ORDER BY id""".stripMargin
  }

  /** Shared CTE chain for the portable SimHash oracles, mirroring
    * Dedup.simhashPortable stage by stage: tokenize → tf → md5 nibble
    * bits → tf-weighted bit sums → four 16-bit band longs. `fromDocs`
    * must provide (id, text). */
  private def simhashCtes(fromDocs: String): String = {
    val bitCols = (0 until 64).map { g =>
      s"sum(CASE WHEN ((CAST('0x' || substr(hx, ${g / 4 + 1}, 1) AS BIGINT) " +
        s">> ${g % 4}) & 1) = 1 THEN tf ELSE -tf END) AS b_$g"
    }.mkString(",\n    ")
    val bandCols = (0 until 4).map { b =>
      val terms = (0 until 16)
        .map(i => s"(CASE WHEN b_${b * 16 + i} > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"CAST($terms AS BIGINT) AS band$b"
    }.mkString(",\n    ")
    s"""toks AS (
       |  SELECT id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                         x -> len(x) > 0) AS ts
       |  FROM $fromDocs),
       |tf AS (SELECT id, tok, count(*) AS tf
       |       FROM (SELECT id, unnest(ts) AS tok FROM toks) GROUP BY 1, 2),
       |h AS (SELECT id, tf, md5(tok) AS hx FROM tf),
       |bits AS (SELECT id,
       |    $bitCols
       |  FROM h GROUP BY id),
       |sk AS (SELECT id,
       |    $bandCols
       |  FROM bits)""".stripMargin
  }

  /** Generated oracle for the portable SimHash banded pairs: band →
    * bucket join → per-band bit_count(xor) hamming verify. */
  private def simhashPortablePairsOracle(maxHamming: Int): String = {
    val ham = (0 until 4)
      .map(b => s"bit_count(xor(a.band$b, b.band$b))").mkString(" + ")
    s"""WITH all_docs AS (
       |  SELECT doc_id AS id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
       |${simhashCtes("all_docs")},
       |banded AS (SELECT sk.id, b.band,
       |    CASE b.band WHEN 0 THEN band0 WHEN 1 THEN band1
       |                WHEN 2 THEN band2 ELSE band3 END AS bh
       |  FROM sk CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |         WHERE a.id < b.id),
       |ver AS (SELECT id_a, id_b, CAST($ham AS BIGINT) AS hamming
       |  FROM cand JOIN sk a ON id_a = a.id JOIN sk b ON id_b = b.id)
       |SELECT id_a, id_b, hamming FROM ver WHERE hamming <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Generated oracle for the d35 index admission: the d10 sketch CTEs
    * once over the full corpus, a band-bucket join of every doc (batch
    * side) against the doc_id%3≠0 slice (index side), per-pair hamming
    * verify, then the anti-join — identical arithmetic to
    * Dedup.writeSimhashIndex + simhashAdmit. */
  private def simhashAdmitOracle(maxHamming: Int): String = {
    val ham = (0 until 4)
      .map(b => s"bit_count(xor(sa.band$b, sb.band$b))").mkString(" + ")
    s"""WITH all_docs AS (SELECT doc_id AS id, text FROM documents),
       |${simhashCtes("all_docs")},
       |banded AS (SELECT sk.id, b.band,
       |    CASE b.band WHEN 0 THEN band0 WHEN 1 THEN band1
       |                WHEN 2 THEN band2 ELSE band3 END AS bh
       |  FROM sk CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
       |rej AS (SELECT DISTINCT a.id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  JOIN sk sa ON sa.id = a.id JOIN sk sb ON sb.id = b.id
       |  WHERE b.id % 3 <> 0 AND ($ham) <= $maxHamming)
       |SELECT id AS doc_id FROM sk WHERE id NOT IN (SELECT id FROM rej)
       |ORDER BY doc_id""".stripMargin
  }

  /** Generated oracle for sw29: the d35 CTEs over the full corpus, a
    * feed of odd docs + planted replays (ids +1e6 mapping back to
    * their source sketch), band join against the even-half index,
    * hamming verify, anti-join. */
  private[queries] def simhashStreamAdmissionOracle(maxHamming: Int): String = {
    val ham = (0 until 4)
      .map(b => s"bit_count(xor(sa.band$b, sb.band$b))").mkString(" + ")
    s"""WITH all_docs AS (SELECT doc_id AS id, text FROM documents),
       |${simhashCtes("all_docs")},
       |banded AS (SELECT sk.id, b.band,
       |    CASE b.band WHEN 0 THEN band0 WHEN 1 THEN band1
       |                WHEN 2 THEN band2 ELSE band3 END AS bh
       |  FROM sk CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
       |feed AS (SELECT doc_id AS id FROM documents WHERE doc_id % 2 <> 0
       |  UNION ALL
       |  SELECT doc_id + 1000000 FROM documents WHERE doc_id % 10 = 0),
       |rej AS (SELECT DISTINCT f.id
       |  FROM feed f
       |  JOIN banded a ON a.id =
       |    CASE WHEN f.id >= 1000000 THEN f.id - 1000000 ELSE f.id END
       |  JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  JOIN sk sa ON sa.id = a.id JOIN sk sb ON sb.id = b.id
       |  WHERE b.id % 2 = 0 AND ($ham) <= $maxHamming)
       |SELECT id FROM feed WHERE id NOT IN (SELECT id FROM rej)
       |ORDER BY id""".stripMargin
  }

  /** Generated oracle for the embedding near-dup KEEP (d13): the d06
    * LSH-pair CTEs + unrolled min-label component steps + min-id
    * survivors — mirroring Similarity.dropNearDupEmbeddingsLsh. */
  private def neardupEmbKeepOracle(dim: Int, nBits: Int, bands: Int,
      minCos: Double, seed: Long, iters: Int): String = {
    val base = neardupLshOracle(dim, nBits, bands, minCos, seed)
    val ctes = base.substring(0, base.indexOf("\nSELECT id_a"))
    val steps = OracleFragments.minLabelSteps("symp", iters)
    s"""$ctes,
       |pairs AS (SELECT id_a, id_b FROM scored WHERE cos >= $minCos),
       |v AS (SELECT vec_id AS id FROM e),
       |symp AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |         UNION ALL SELECT id_b, id_a FROM pairs),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps
       |SELECT id AS vec_id FROM l$iters WHERE id = label ORDER BY vec_id""".stripMargin
  }

  /** Generated oracle for the LSH-banded embedding near-dup: rebuild
    * signatures from the inlined planes, band→bucket join for
    * candidates, exact cosine ≥ minCos — mirroring
    * Similarity.cosineNearDupPairsLsh stage by stage. */
  /** Planted input for d19: originals plus 80%-truncated mirror
    * copies — near-dups with a REAL quality difference, so the
    * keep-best rule (most tokens wins) is actually exercised.
    * floor() before the int cast on BOTH engines: DuckDB's
    * DOUBLE→INTEGER cast rounds-to-nearest where Spark's truncates. */
  private def truncatedDocsCte: String =
    """SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000,
      |    substr(text, 1, CAST(floor(length(text) * 0.8) AS INT))
      |  FROM documents""".stripMargin

  /** Generated oracle for d19 — the d08 pair CTEs over the truncated
    * planted input, unrolled min-label components, then ONE window
    * per cluster keeping the max-token (ties → min id) member. */
  private def neardupBestKeptOracle(numHashes: Int, bands: Int,
      minJaccard: Double, iters: Int): String = {
    val base = minhashPortableOracle(numHashes, bands, minJaccard,
      allDocs = truncatedDocsCte)
    val ctes = base.substring(0, base.indexOf("\nSELECT id_a"))
    val steps = OracleFragments.minLabelSteps("symp", iters)
    s"""$ctes,
       |pairs AS (SELECT id_a, id_b FROM ver WHERE est_jaccard >= $minJaccard),
       |v AS (SELECT doc_id AS id FROM all_docs),
       |symp AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |         UNION ALL SELECT id_b, id_a FROM pairs),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps,
       |q AS (SELECT doc_id,
       |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                    x -> len(x) > 0)) AS n_tokens
       |  FROM all_docs),
       |ranked AS (SELECT l.id, row_number() OVER (
       |    PARTITION BY l.label ORDER BY q.n_tokens DESC, l.id) AS rn
       |  FROM l$iters l JOIN q ON l.id = q.doc_id)
       |SELECT id AS doc_id FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** Generated oracle for d18 — the d06 signature/band CTEs, but the
    * candidate join is CROSS-SET (corpus side % 10 ≠ 0 vs benchmark
    * side % 10 = 0) and the output is the anti-joined survivor set. */
  private def semanticDecontamOracle(dim: Int, nBits: Int, bands: Int,
      minCos: Double, seed: Long): String = {
    val rows = nBits / bands
    val mask = (1L << rows) - 1
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes AS (
       |  ${planesSql(dim, nBits, seed)}),
       |sig AS (SELECT e.vec_id,
       |    CAST(sum(CASE WHEN ${dotSql("e.v", "planes.p")} > 0
       |        THEN (CAST(1 AS BIGINT) << planes.k) ELSE 0 END) AS BIGINT) AS sg
       |  FROM e CROSS JOIN planes GROUP BY e.vec_id),
       |nrm AS (SELECT vec_id, sqrt(${dotSql("v", "v")}) AS nm FROM e),
       |bnd AS (SELECT sig.vec_id, b.band, (sg >> (b.band * $rows)) & $mask AS bh
       |        FROM sig CROSS JOIN (
       |          SELECT unnest(generate_series(0, ${bands - 1})) AS band) b),
       |cand AS (SELECT DISTINCT c.vec_id AS id, bm.vec_id AS bid
       |         FROM bnd c JOIN bnd bm ON c.band = bm.band AND c.bh = bm.bh
       |         WHERE c.vec_id % 10 != 0 AND bm.vec_id % 10 = 0),
       |flag AS (SELECT DISTINCT id FROM cand
       |  JOIN e ec ON cand.id = ec.vec_id JOIN e eb ON cand.bid = eb.vec_id
       |  JOIN nrm nc ON cand.id = nc.vec_id JOIN nrm nb ON cand.bid = nb.vec_id
       |  WHERE round(${dotSql("ec.v", "eb.v")} / (nc.nm * nb.nm), 6) >= $minCos)
       |SELECT vec_id FROM e
       |WHERE vec_id % 10 != 0 AND vec_id NOT IN (SELECT id FROM flag)
       |ORDER BY vec_id""".stripMargin
  }

  private def neardupLshOracle(dim: Int, nBits: Int, bands: Int,
      minCos: Double, seed: Long): String = {
    val rows = nBits / bands
    val mask = (1L << rows) - 1
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes AS (
       |  ${planesSql(dim, nBits, seed)}),
       |sig AS (SELECT e.vec_id,
       |    CAST(sum(CASE WHEN ${dotSql("e.v", "planes.p")} > 0
       |        THEN (CAST(1 AS BIGINT) << planes.k) ELSE 0 END) AS BIGINT) AS sg
       |  FROM e CROSS JOIN planes GROUP BY e.vec_id),
       |nrm AS (SELECT vec_id, sqrt(${dotSql("v", "v")}) AS nm FROM e),
       |bnd AS (SELECT sig.vec_id, b.band, (sg >> (b.band * $rows)) & $mask AS bh
       |        FROM sig CROSS JOIN (
       |          SELECT unnest(generate_series(0, ${bands - 1})) AS band) b),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM bnd a JOIN bnd b ON a.band = b.band AND a.bh = b.bh
       |         WHERE a.vec_id < b.vec_id),
       |scored AS (SELECT id_a, id_b,
       |    round(${dotSql("ea.v", "eb.v")} / (na.nm * nb.nm), 6) AS cos
       |  FROM cand
       |  JOIN e ea ON id_a = ea.vec_id JOIN e eb ON id_b = eb.vec_id
       |  JOIN nrm na ON id_a = na.vec_id JOIN nrm nb ON id_b = nb.vec_id)
       |SELECT id_a, id_b, cos FROM scored WHERE cos >= $minCos
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Generated oracle for the random-hyperplane LSH ANN: the seeded
    * planes are inlined as exact double literals
    * (Double.toString round-trips), signatures rebuilt bit-for-bit,
    * then band-bucket join + exact cosine + rank — mirroring
    * Similarity.lshCosineTopK stage by stage. */
  /** CTE block ending in `ranked` (query_id, neighbor_id, cos, rank)
    * — shared by the s02 oracle and the s13 recall-audit composition. */
  private def lshAnnCtes(dim: Int, nBits: Int, bands: Int, seed: Long): String = {
    val rows = nBits / bands
    val mask = (1L << rows) - 1
    def dot(a: String, b: String) = dotSql(a, b)
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes AS (
       |  ${planesSql(dim, nBits, seed)}),
       |sig AS (SELECT e.vec_id,
       |    CAST(sum(CASE WHEN ${dot("e.v", "planes.p")} > 0
       |        THEN (CAST(1 AS BIGINT) << planes.k) ELSE 0 END) AS BIGINT) AS sg
       |  FROM e CROSS JOIN planes GROUP BY e.vec_id),
       |nrm AS (SELECT vec_id, sqrt(${dot("v", "v")}) AS nm FROM e),
       |bnd AS (SELECT sig.vec_id, b.band, (sg >> (b.band * $rows)) & $mask AS bh
       |        FROM sig CROSS JOIN (
       |          SELECT unnest(generate_series(0, ${bands - 1})) AS band) b),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |         FROM bnd q JOIN bnd c ON q.band = c.band AND q.bh = c.bh
       |         WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |scored AS (SELECT query_id, neighbor_id,
       |    round(${dot("eq.v", "ec.v")} / (nq.nm * nc.nm), 6) AS cos
       |  FROM cand
       |  JOIN e eq ON query_id = eq.vec_id JOIN e ec ON neighbor_id = ec.vec_id
       |  JOIN nrm nq ON query_id = nq.vec_id JOIN nrm nc ON neighbor_id = nc.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)""".stripMargin
  }

  private def lshAnnOracle(dim: Int, nBits: Int, bands: Int, k: Int,
      seed: Long): String =
    s"""WITH ${lshAnnCtes(dim, nBits, bands, seed)}
       |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Generated oracle for the near-dup KEEP operator (d12): the d08
    * pair CTEs + unrolled min-label component steps + survivors whose
    * id equals their component label — mirroring
    * Dedup.dropNearDupsPortable stage by stage. */
  private def neardupKeepOracle(numHashes: Int, bands: Int,
      minJaccard: Double, iters: Int): String = {
    val base = minhashPortableOracle(numHashes, bands, minJaccard)
    // reuse everything up to (and including) the `ver` CTE
    val ctes = base.substring(0, base.indexOf("\nSELECT id_a"))
    val steps = OracleFragments.minLabelSteps("symp", iters)
    s"""$ctes,
       |pairs AS (SELECT id_a, id_b FROM ver WHERE est_jaccard >= $minJaccard),
       |v AS (SELECT doc_id AS id FROM all_docs),
       |symp AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |         UNION ALL SELECT id_b, id_a FROM pairs),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps
       |SELECT id AS doc_id FROM l$iters WHERE id = label ORDER BY doc_id""".stripMargin
  }

  /** Oracle CTE stack for the frozen DSIR LM scores (p28/sw22):
    * hashed-unigram bucket counts over the lang='en' target split,
    * both add-one-smoothed LMs, per-doc summed log-ratio, zero for
    * token-less docs — `footer` selects from the final `scored`
    * (doc_id, score) CTE. */
  private[queries] def dsirScoreOracle(footer: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id AS id, lang = 'en' AS t, unnest(list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'),
       |    x -> len(x) > 0)) AS tok
       |  FROM documents),
       |tb AS (SELECT id, t,
       |    CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) % 1024 AS b
       |  FROM toks),
       |cnt AS (SELECT b,
       |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
       |    sum(CASE WHEN t THEN 0 ELSE 1 END) AS rc
       |  FROM tb GROUP BY b),
       |tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM cnt),
       |lw AS (SELECT b,
       |    ln((tc + 1.0) / (tt + 1024)) - ln((rc + 1.0) / (rt + 1024)) AS lw
       |  FROM cnt CROSS JOIN tot),
       |sc AS (SELECT id, sum(lw) AS s FROM tb JOIN lw USING (b) GROUP BY id),
       |scored AS (SELECT d.doc_id, round(coalesce(sc.s, 0), 6) AS score
       |  FROM documents d LEFT JOIN sc ON sc.id = d.doc_id)
       |$footer""".stripMargin

  /** CTE stack for p31/p32: the t06 surprisal CTEs aggregated per
    * source, then `rounds` unrolled multiplicative-weight CTEs —
    * each round re-rounds w to 6 dp, so both engines enter every
    * round with identical inputs (Sampling.domainReweight's
    * contract). Ends at `r<rounds>` (source, n_tok, loss, w). */
  private def domainReweightCtes(eta: String, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""r$i AS (SELECT source, n_tok, loss,
         |    round(raw / sum(raw) OVER (), 6) AS w
         |  FROM (SELECT source, n_tok, loss,
         |      w * exp($eta * loss * pow(2.0,
         |        -greatest(N * w / n_tok - 1, 0.0))) AS raw
         |    FROM r${i - 1} CROSS JOIN nn))""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT source, unnest(list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'),
       |    x -> len(x) > 0)) AS tok
       |  FROM documents),
       |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
       |n AS (SELECT count(*) AS n_total FROM toks),
       |base AS (SELECT source, count(*) AS n_tok,
       |    round(-avg(ln(cnt::DOUBLE / n_total)), 6) AS loss
       |  FROM toks JOIN freq USING (tok) CROSS JOIN n GROUP BY source),
       |nn AS (SELECT CAST(sum(n_tok) AS BIGINT) AS N FROM base),
       |r0 AS (SELECT source, n_tok, loss,
       |    round(n_tok::DOUBLE / N, 6) AS w FROM base CROSS JOIN nn),
       |$steps""".stripMargin
  }

  private def domainReweightOracle(eta: String, rounds: Int): String =
    s"""${domainReweightCtes(eta, rounds)}
       |SELECT b.source, b.n_tok, b.loss, r0.w AS w_init,
       |  rf.w AS w_final, round(nn.N * rf.w / b.n_tok, 4) AS epochs
       |FROM base b JOIN r0 USING (source) JOIN r$rounds rf USING (source)
       |CROSS JOIN nn ORDER BY source""".stripMargin

  /** Oracle for p32: the p31 weight solve chained into the p20
    * threshold/hash-keep arithmetic — one 6-dp rounded rate per
    * source, floored to an integer bucket threshold, then the exact
    * md5-bucket compare. */
  private def mixMaterializeOracle(eta: String, rounds: Int,
      budget: Long): String =
    s"""${domainReweightCtes(eta, rounds)},
       |thr AS (SELECT source, CAST(floor(round(
       |      least(1.0, $budget * w / n_tok), 6) * 1000000) AS BIGINT) AS thr
       |  FROM r$rounds),
       |tk AS (SELECT doc_id, source, text,
       |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                    x -> len(x) > 0))::BIGINT AS ntok
       |  FROM documents)
       |SELECT tk.source AS source, count(*) AS n_kept,
       |  CAST(sum(ntok) AS BIGINT) AS tok_kept,
       |  min(doc_id) AS min_kept_id
       |FROM tk JOIN thr ON tk.source = thr.source
       |WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1000000
       |      < thr.thr
       |GROUP BY tk.source ORDER BY tk.source""".stripMargin

  /** Oracle for p33: the p31 endpoint CTEs, a dyadic-α phase table,
    * the 6-dp interpolation and the integer floor — identical
    * arithmetic to Sampling.mixtureSchedule. */
  private def mixtureScheduleOracle(eta: String, rounds: Int, phases: Int,
      phaseBudget: Long): String = {
    val alphaRows = (0 until phases).map(t =>
      s"($t, ${t.toDouble / (phases - 1)})").mkString(", ")
    s"""${domainReweightCtes(eta, rounds)},
       |w2 AS (SELECT r0.source, r0.w AS w_init, rf.w AS w_final
       |  FROM r0 JOIN r$rounds rf USING (source)),
       |ph AS (SELECT * FROM (VALUES $alphaRows) AS t(phase, alpha)),
       |sched AS (SELECT ph.phase, w2.source,
       |    round((1 - ph.alpha) * w_init + ph.alpha * w_final, 6) AS w
       |  FROM w2 CROSS JOIN ph)
       |SELECT CAST(phase AS INT) AS phase, source, w,
       |  CAST(floor($phaseBudget * w) AS BIGINT) AS phase_tokens
       |FROM sched ORDER BY phase, source""".stripMargin
  }

  /** Oracle for p34: the full phased-curation replay — p31's solve
    * CTEs, p33's dyadic interpolation, then p32's threshold/hash-keep
    * arithmetic per (phase, source). */
  private def phasedMaterializeOracle(eta: String, rounds: Int, phases: Int,
      phaseBudget: Long): String = {
    val alphaRows = (0 until phases).map(t =>
      s"($t, ${t.toDouble / (phases - 1)})").mkString(", ")
    s"""${domainReweightCtes(eta, rounds)},
       |w2 AS (SELECT r0.source, r0.w AS w_init, rf.w AS w_final, r0.n_tok
       |  FROM r0 JOIN r$rounds rf USING (source)),
       |ph AS (SELECT * FROM (VALUES $alphaRows) AS t(phase, alpha)),
       |sched AS (SELECT ph.phase, w2.source, w2.n_tok,
       |    round((1 - ph.alpha) * w_init + ph.alpha * w_final, 6) AS w
       |  FROM w2 CROSS JOIN ph),
       |thr AS (SELECT phase, source, CAST(floor(round(
       |      least(1.0, $phaseBudget * w / n_tok), 6) * 1000000) AS BIGINT)
       |    AS thr
       |  FROM sched),
       |tk AS (SELECT doc_id, source, text,
       |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                    x -> len(x) > 0))::BIGINT AS ntok
       |  FROM documents)
       |SELECT CAST(thr.phase AS INT) AS phase, tk.source AS source,
       |  count(*) AS n_kept, CAST(sum(ntok) AS BIGINT) AS tok_kept
       |FROM tk JOIN thr ON tk.source = thr.source
       |WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1000000
       |      < thr.thr
       |GROUP BY 1, 2 ORDER BY phase, source""".stripMargin
  }

  /** Shared CTE prefix for d34/p36: the d12 cluster-label chain
    * through per-label sizes (`cs`) + per-doc token counts (`tk`),
    * labels in `l<iters>`. */
  private def softDedupCtes(numHashes: Int, bands: Int,
      minJaccard: Double, iters: Int): String = {
    val base = minhashPortableOracle(numHashes, bands, minJaccard)
    val ctes = base.substring(0, base.indexOf("\nSELECT id_a"))
    val steps = OracleFragments.minLabelSteps("symp", iters)
    s"""$ctes,
       |pairs AS (SELECT id_a, id_b FROM ver WHERE est_jaccard >= $minJaccard),
       |v AS (SELECT doc_id AS id FROM all_docs),
       |symp AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |         UNION ALL SELECT id_b, id_a FROM pairs),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps,
       |cs AS (SELECT label, count(*) AS cluster_size
       |  FROM l$iters GROUP BY label),
       |tk AS (SELECT doc_id AS id, len(list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'),
       |    x -> len(x) > 0)) AS n_tokens
       |  FROM all_docs)""".stripMargin
  }

  /** Oracle for d34: the d12 cluster-label CTEs, then per-label sizes
    * → 1/size weights → effective token mass. */
  private def softDedupOracle(numHashes: Int, bands: Int,
      minJaccard: Double, iters: Int): String =
    s"""${softDedupCtes(numHashes, bands, minJaccard, iters)}
       |SELECT l.id AS doc_id, l.label, cs.cluster_size,
       |  round(1.0 / cs.cluster_size, 6) AS weight,
       |  round(tk.n_tokens * 1.0 / cs.cluster_size, 4) AS eff_tokens
       |FROM l$iters l JOIN cs USING (label) JOIN tk ON tk.id = l.id
       |ORDER BY doc_id""".stripMargin

  /** Oracle for p16: the d12 cluster-label CTEs, then the p01 hash-
    * split convention applied to the LABEL instead of the document. */
  private def leakageSplitOracle(numHashes: Int, bands: Int,
      minJaccard: Double, iters: Int): String = {
    val base = minhashPortableOracle(numHashes, bands, minJaccard)
    val ctes = base.substring(0, base.indexOf("\nSELECT id_a"))
    val steps = OracleFragments.minLabelSteps("symp", iters)
    s"""$ctes,
       |pairs AS (SELECT id_a, id_b FROM ver WHERE est_jaccard >= $minJaccard),
       |v AS (SELECT doc_id AS id FROM all_docs),
       |symp AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |         UNION ALL SELECT id_b, id_a FROM pairs),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps,
       |sp AS (SELECT id, label,
       |    CAST('0x' || substr(md5(CAST(label AS VARCHAR)), 1, 8) AS BIGINT)
       |      % 10 AS bucket
       |  FROM l$iters)
       |SELECT CASE WHEN bucket < 7 THEN 'train'
       |            WHEN bucket < 8 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n_docs, count(DISTINCT label) AS n_clusters
       |FROM sp GROUP BY 1 ORDER BY split""".stripMargin
  }

  /** Generated oracle for the portable MinHash: same shingling CTE as
    * d02, ONE md5 per shingle split into two 32-bit halves, hash i =
    * (h1 + i·h2 + i²) mod 2147483647 (Kirsch–Mitzenmacher double
    * hashing — mirrors Dedup.minhashLshPairsPortable), min per doc,
    * band hashes, bucket join, agreement verify. */
  private[queries] def minhashPortableOracle(numHashes: Int, bands: Int,
      minJaccard: Double,
      allDocs: String = """SELECT doc_id, text FROM documents
                          |  UNION ALL SELECT doc_id + 1000000, text FROM documents"""
        .stripMargin): String = {
    val rows = numHashes / bands
    val minCols = (0 until numHashes)
      .map(i => s"min((h1 + $i * h2 + ${i.toLong * i}) % 2147483647) AS mh_$i")
      .mkString(",\n    ")
    val bandRows = (0 until bands).map { b =>
      val cat = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(mh_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($cat) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until numHashes)
      .map(i => s"CASE WHEN a.mh_$i = b.mh_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH all_docs AS (
       |  $allDocs),
       |toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                             x -> len(x) > 0) AS ts
       |  FROM all_docs),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(ts) - 2), i -> array_to_string(ts[i:i+2], ' '))) AS arr
       |  FROM toks WHERE len(ts) >= 3),
       |ex AS (SELECT doc_id AS id, unnest(arr) AS sh FROM shs),
       |hs AS (SELECT id,
       |    CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) AS h2
       |  FROM ex),
       |sig AS (SELECT id,
       |    $minCols
       |  FROM hs GROUP BY id),
       |banded AS (
       |  $bandRows),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |         WHERE a.id < b.id),
       |ver AS (SELECT id_a, id_b,
       |    round(($agree) / ${numHashes.toDouble}, 6) AS est_jaccard
       |  FROM cand JOIN sig a ON id_a = a.id JOIN sig b ON id_b = b.id)
       |SELECT id_a, id_b, est_jaccard FROM ver
       |WHERE est_jaccard >= $minJaccard
       |ORDER BY id_a, id_b""".stripMargin
  }
}
