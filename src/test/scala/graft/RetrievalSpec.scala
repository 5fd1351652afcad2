package graft

import org.apache.spark.sql.functions._

import graft.text.Retrieval

/** BM25 + RRF hybrid retrieval semantics on hand-checkable corpora. */
class RetrievalSpec extends SparkSpec {

  test("bm25TopK: tf wins over single occurrence; non-matching docs absent") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana banana")).toDF("doc_id", "text")
    val qs = Seq((99L, "apple")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", qs,
        "query_id", "qtext", k = 10)
      .orderBy("rank")
      .select("doc_id", "rank", "score").as[(Long, Int, Double)].collect()
    // d1 (tf=2) outranks d2 (tf=1); d3 has no query term → absent
    assert(got.map(_._1).toSeq === Seq(1L, 2L))
    assert(got.map(_._2).toSeq === Seq(1, 2))
    // hand-computed: idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6);
    // d1: 2·2.2/(2 + 1.2·(0.25 + 0.75·3/(8/3.0)))
    val idf = math.log(1.6)
    val avgdl = 8 / 3.0
    def s(tf: Int, dl: Int) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(got(0)._3 - s(2, 3)) < 1e-5)
    assert(math.abs(got(1)._3 - s(1, 2)) < 1e-5)
  }

  test("bm25TopK: repeated query terms score once; query's own doc excluded") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana"),
      (2L, "apple banana")).toDF("doc_id", "text")
    val q1 = Seq((9L, "apple")).toDF("query_id", "qtext")
    val q2 = Seq((9L, "apple apple apple")).toDF("query_id", "qtext")
    def run(q: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(corpus, "doc_id", "text", q, "query_id", "qtext", 10)
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(run(q1) === run(q2)) // bag-of-TERMS: repeats don't double-count
    // self-exclusion: a query whose id IS a corpus doc never returns it
    val self = Seq((1L, "apple")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", self,
      "query_id", "qtext", 10).select("doc_id").as[Long].collect()
    assert(got.toSeq === Seq(2L))
  }

  test("rrfFuse: doc on both lists beats single-list docs; scores are 1/(c+r) sums") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b, k = 10)
      .orderBy("rank")
      .select("doc_id", "rrf", "rank").as[(Long, Double, Int)].collect()
    assert(got.map(_._1).toSeq === Seq(20L, 10L, 30L))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._2 === r6(1.0 / 62 + 1.0 / 61))
    assert(got(1)._2 === r6(1.0 / 61))
    assert(got(2)._2 === r6(1.0 / 62))
    assert(got.map(_._3).toSeq === Seq(1, 2, 3))
  }

  private def liftCorpus(n: Int) = {
    import spark.implicits._
    // shared vocabulary with per-doc variation so df/tf/dl all differ
    (0 until n).map(i => (i.toLong,
      s"common shared term${i % 7} word${i % 3} filler${i} tail " +
        ("pad " * (i % 5))))
      .toDF("doc_id", "text")
  }

  private def serveAll(path: String, qs: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    Retrieval.bm25TopKFromIndex(spark, path, qs, "query_id", "qtext", k = 5)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq
  }

  test("postings index: build+serve == direct bm25; append == full build") {
    import spark.implicits._
    val docs = liftCorpus(40)
    val qs = Seq((100L, "common term1 word2"), (101L, "shared filler7"))
      .toDF("query_id", "qtext")
    val full = ScratchDirs.scratch("t_bm25_full")
    Retrieval.writePostingsIndex(docs, "doc_id", "text", full)
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "qtext", k = 5)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    assert(serveAll(full, qs) === direct)
    val grown = ScratchDirs.scratch("t_bm25_grow")
    Retrieval.writePostingsIndex(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", grown)
    Retrieval.appendToPostingsIndex(docs.filter($"doc_id" % 2 =!= 0),
      "doc_id", "text", grown)
    assert(serveAll(grown, qs) === direct)
  }

  test("postings tombstones: serve == rebuild on retained; compaction transparent") {
    import spark.implicits._
    val docs = liftCorpus(40)
    val qs = Seq((100L, "common term1 word2")).toDF("query_id", "qtext")
    val path = ScratchDirs.scratch("t_bm25_ts")
    Retrieval.writePostingsIndex(docs, "doc_id", "text", path)
    Retrieval.tombstonePostingsIndex(
      docs.filter($"doc_id" % 3 === 0).select("doc_id"), "doc_id", path)
    val retained = ScratchDirs.scratch("t_bm25_retained")
    Retrieval.writePostingsIndex(docs.filter($"doc_id" % 3 =!= 0),
      "doc_id", "text", retained)
    val want = serveAll(retained, qs)
    assert(serveAll(path, qs) === want, "tombstoned serve != rebuild")
    Retrieval.compactPostingsIndex(spark, path)
    assert(!graft.Fs.exists(spark, s"$path/tombstones"))
    assert(serveAll(path, qs) === want, "post-compaction serve changed")
  }
}
