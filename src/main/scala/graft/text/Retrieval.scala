package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: BM25 scoring and
  * reciprocal-rank fusion (RRF) — the production hybrid-search pair
  * (Robertson & Zaragoza 2009 for BM25; Cormack et al. SIGIR'09 for
  * RRF). A training-data pipeline uses these to mine topical subsets
  * ("find docs about X"), to audit retrieval quality of a dense index
  * against a lexical baseline, and to fuse the two for hybrid dedup /
  * contamination review queues.
  *
  * Scale shape: the corpus side is reduced ONCE to a (doc, term, tf)
  * posting table + per-doc length (one tokenize scan, map-side
  * combine); the query side is tiny and broadcast, so scoring is a
  * scan-stage broadcast join over the postings — no corpus×corpus
  * work, no all-pairs. At 100 TB the postings build is the one keyed
  * shuffle; every query batch after it is broadcast-joined.
  */
object Retrieval {

  /** BM25 top-k per query. `corpus` = (id, text); `queries` =
    * (query_id, qtext). Standard BM25 with the +1-smoothed idf
    * (always positive): idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    * tf-part = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). Scores are
    * rounded to 6 before ranking so rank ties (likely on a small
    * vocabulary: equal tf profiles + equal length ⇒ equal score)
    * break on doc_id identically in both engines regardless of
    * double-sum fold order. Query's own doc (query_id == doc id) is
    * excluded so the fused hybrid doesn't trivially return the query.
    * Output: (query_id, doc_id, score, rank), rank 1-based. */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // posting table: one tokenize pass, one (doc, term) keyed agg
    // (map-side combine); dl/avgdl derive from the postings, not a
    // second text scan. CACHED: three consumers (dl, dfq, contrib)
    // would otherwise re-run the tokenize+agg per consumer — measured
    // 11.1 → 4.4 s at 30× sf0.1. In a serving deployment this table
    // is the persisted index artifact, built once.
    val tf = graft.Caches.cached(corpus
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // avgdl as exact-integer sum ÷ count (ONE double division) so both
    // engines compute the identical double, independent of fold order
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("__sdl"))
      .withColumn("avgdl", col("__sdl").cast("double") / col("n_docs"))
      .drop("__sdl")

    // query terms are a set (array_distinct: repeated query terms
    // score once, the standard bag-of-query-TERMS form) and tiny —
    // df is restricted to them BEFORE joining the postings, so the
    // per-query work is broadcast × postings.
    val qterms = queries
      .select(col(qidCol).as("query_id"),
        explode(array_distinct(TextOps.tokens(col(qtextCol)))).as("tok"))
    val dfq = tf.join(broadcast(qterms.select("tok").distinct()), Seq("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val qside = broadcast(qterms.join(dfq, Seq("tok")).crossJoin(stats))

    val contrib = tf.join(qside, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("w",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(round(sum("w"), 6).as("score"))
    // top-k in the TopK aggregator (map-side combine — each partition
    // ships k candidates per query) instead of a global per-query
    // window sort of every scored (query, doc) pair; ties break
    // (score desc, doc_id asc), matching the oracle's row_number.
    import graft.functions.TopK
    scored.groupBy("query_id")
      .agg(TopK.topK(k)(col("doc_id"), col("score")).as("__nn"))
      .select(col("query_id"), posexplode(col("__nn")).as(Seq("__r", "__s")))
      .select(col("query_id"), col("__s.id").as("doc_id"),
        col("__s.score").as("score"), (col("__r") + 1).cast("int").as("rank"))
  }

  /** Reciprocal-rank fusion of two ranked lists, each (query_id,
    * doc_id, rank): rrf = Σ 1/(c + rank) over the lists the doc
    * appears in (Cormack's c = 60 default). The two contributions are
    * added as ONE binary `+` (not an agg sum), so the double is
    * fold-order-deterministic across engines; rounded to 6 before the
    * fused rank so ties break on doc_id identically. Output:
    * (query_id, doc_id, rrf, rank) — top `k` per query. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(c.toDouble) + col("rank"))).as(s"__$tag"))
    val fused = side(a, "a")
      .join(side(b, "b"), Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        round(coalesce(col("__a"), lit(0.0)) + coalesce(col("__b"), lit(0.0)), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.select("query_id", "doc_id", "rrf")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
