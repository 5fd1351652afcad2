package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens lowercases, splits on non-alnum, drops empties") {
    val got = Seq("Hello, World!  foo-bar 42").toDF("t")
      .select(TextOps.tokens($"t")).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "foo", "bar", "42"))
  }

  test("punctRatio and stopwordRatio handle empty text without NaN") {
    val got = Seq("", "a.b,c", "the cat the dog").toDF("t")
      .select(round(TextOps.punctRatio($"t"), 4).as("p"),
        round(TextOps.stopwordRatio($"t", Seq("the")), 4).as("s"))
      .as[(Double, Double)].collect().toSeq
    assert(got(0) == ((0.0, 0.0)))
    assert(got(1)._1 == 0.4) // 2 punct chars of 5
    assert(got(2)._2 == 0.5) // 2 of 4 tokens are 'the'
  }

  test("langId votes by marker tokens with first-language tie-break") {
    val got = Seq(
      "the cat and the dog is in a house",
      "le chat et la maison est pour un jour",
      "xyzzy qwerty")
      .toDF("t").select(TextOps.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "fr", "und"))
  }

  test("fingerprint invariant to whitespace/punct normalization, sensitive to content") {
    val got = Seq("hello world", "Hello,   WORLD!", "hello there")
      .toDF("t").select(TextOps.fingerprint($"t")).as[Long].collect().toSeq
    assert(got(0) == got(1))
    assert(got(0) != got(2))
  }

  test("qualityScore stays within [0,1] on real documents") {
    val stats = Tables.documents(spark, sf)
      .select(TextOps.qualityScore($"text", TextOps.langMarkers.head._2).as("q"))
      .agg(min("q"), max("q")).as[(Double, Double)].head()
    assert(stats._1 >= 0.0 && stats._2 <= 1.0)
  }

  test("unigramSurprisal: common words score lower than rare ones") {
    val docs = Seq(
      (1L, "the the the the"),     // most common token → minimal surprisal
      (2L, "zyx qwv ploink gnarf") // singletons → maximal surprisal
    ).toDF("doc_id", "text")
    val got = graft.text.TextOps.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(1L) < got(2L))
    // doc 1: p(the) = 4/8 → surprisal = ln 2; doc 2: p = 1/8 → ln 8
    assert(math.abs(got(1L) - math.log(2)) < 1e-3)
    assert(math.abs(got(2L) - math.log(8)) < 1e-3)
  }

  test("curateDocuments composes quality gate, lang gate, dedup, split") {
    val prose = "the cat and the dog went to the house in the garden " +
      "and it was good for them"
    val docs = Seq(
      (1L, prose),
      (2L, prose),                                 // exact duplicate → dropped
      (3L, "zzz qqq xxx"),                         // junk: quality below gate
      (4L, "le chat et le chien est dans la maison et il est bon")) // French
      .toDF("doc_id", "text")
    val got = graft.text.Curation
      .curateDocuments(docs, "doc_id", "text", minQuality = 0.3, keepLangs = Seq("en"))
      .as[(Long, Double, String, String)].collect()
    assert(got.map(_._1).toSeq == Seq(1L)) // min-id survivor only
    val (_, q, lang, split) = got.head
    assert(q >= 0.3 && lang == "en" && Set("train", "val", "test").contains(split))
  }

  test("repetition stats: templated text scores high, varied text low, empty zero") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),  // heavy 2-gram repetition
      (2L, "one two three four five six seven eight"), // all distinct
      (3L, "")
    ).toDF("id", "text")
    val got = docs.select($"id",
        TextOps.dupNgramFrac($"text", 2).as("d2"),
        TextOps.topTokenFrac($"text").as("tt"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // "buy now"×4: 7 bigrams, 2 distinct → 1 - 2/7; top token 4/8
    assert(math.abs(got(1L)._1 - (1.0 - 2.0 / 7)) < 1e-6)
    assert(got(1L)._2 == 0.5)
    assert(got(2L)._1 == 0.0 && got(2L)._2 == 0.125)
    assert(got(3L) == (0.0, 0.0))
  }

  test("PII redaction counts and scrubs emails/phones, leaves clean text alone") {
    val docs = Seq(
      (1L, "reach me at jo.doe+x@corp.example.org or 415-555-0199 thanks"),
      (2L, "no pii in this sentence at all")
    ).toDF("id", "text")
    val got = docs.select($"id",
        TextOps.emailCount($"text").as("e"), TextOps.phoneCount($"text").as("p"),
        TextOps.redactPii($"text").as("r"))
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1 && got(1L)._3 == 1)
    assert(got(1L)._4 == "reach me at <EMAIL> or <PHONE> thanks")
    assert(got(2L)._2 == 0 && got(2L)._3 == 0 && got(2L)._4 == "no pii in this sentence at all")
  }

  test("normalizeText: NFC composes decomposed chars, collapses whitespace, idempotent") {
    val docs = Seq(
      (1L, "café  du\n\tmonde"),  // decomposed e + U+0301, messy whitespace
      (2L, "  plain ascii text  "),
      (3L, "café du monde")          // already composed + clean
    ).toDF("id", "text")
    val got = docs.select($"id", TextOps.normalizeText($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "café du monde") // composed single code point
    assert(got(2L) == "plain ascii text")
    assert(got(3L) == "café du monde")
    // idempotent: normalizing the normalized form is a no-op
    val again = docs.select($"id",
        TextOps.normalizeText(TextOps.normalizeText($"text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(again == got)
  }

  test("oovRate: top-K vocab by count with token-asc ties; occurrences counted") {
    // counts: aa=4, bb=3, cc=3, dd=1 → vocab(2) = {aa, bb} (bb beats
    // cc on the token-asc tie-break)
    val docs = Seq(
      (1L, "aa aa bb cc"),
      (2L, "aa bb cc dd"),
      (3L, "aa bb cc")
    ).toDF("doc_id", "text")
    val got = TextOps.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .select("id", "n_tokens", "n_oov").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((4L, 1L))) // cc
    assert(got(2L) == ((4L, 2L))) // cc dd
    assert(got(3L) == ((3L, 1L))) // cc
  }

  test("bigramSurprisal: add-one smoothed conditional logp; short docs emit 0/0") {
    import spark.implicits._
    // uni: a=3, b=3, x=1, V=3; bigrams (a,b)=2, (b,a)=2 →
    // p(b|a) = (2+1)/(3+3) = 0.5 = p(a|b) → surprisal ln 2 = 0.6931
    val docs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 3L, 0.6931), (2L, 1L, 0.6931),
      (3L, 0L, 0.0), (4L, 0L, 0.0)))
  }

  test("bigramSurprisalFrom: reference-trained LM scores unseen corpus content") {
    import spark.implicits._
    // reference "a b a b": uni a=2, b=2, V=2; c2 (a,b)=2, (b,a)=1
    val ref = Seq((100L, "a b a b")).toDF("doc_id", "text")
    // doc 1 "a b c": (a,b) → ln(3/4); (b,c) unseen bigram → ln(1/4)
    //   surprisal = -(ln .75 + ln .25)/2 = 0.837
    // doc 2 "x y": both tokens unseen → ln(1/(0+2)) → 0.6931
    // doc 3 "a": no bigrams → 0/0
    val corpus = Seq((1L, "a b c"), (2L, "x y"), (3L, "a"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramSurprisalFrom(ref, corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.837), (2L, 1L, 0.6931), (3L, 0L, 0.0)))
  }

  test("bpePairCounts: word-frequency-weighted adjacent pair counts") {
    import spark.implicits._
    // tf: ab=3 ("ab ab. AB!"), abc=1 → pairs: ab: 3+1, bc: 1
    val docs = Seq("ab ab abc", "AB!").toDF("text")
    val got = TextOps.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got == Map("ab" -> 4L, "bc" -> 1L))
  }

  test("bpeTrain: merge order follows max count with lexicographic ties, greedy re-segment") {
    import spark.implicits._
    // tf: aaab=2, ab=1. Round 0 pairs: (a,a)=4, (a,b)=3 → merge "a a";
    // greedy left-to-right re-segment: "a a a b" → "aa a b" (NOT "a aa b").
    // Round 1: (aa,a)=2, (a,b)=2+1 → merge "a b". Round 2: (aa,ab)=2.
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = TextOps.bpeTrain(docs, "text", merges = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, "a a", 4L), (1L, "a b", 3L), (2L, "aa ab", 2L)))
  }

  test("bpeEncodedCounts: pieces counted under the trained segmentation; empty doc 0/0") {
    import spark.implicits._
    // after the 3 trained rounds ("a a", "a b", "aa ab" — see the
    // bpeTrain test) both vocab tokens collapse to ONE piece:
    // aaab -> [aaab], ab -> [ab]; so "aaab aaab ab" = 3 tokens,
    // 1+1+1 = 3 pieces. With merges = 2 the third round never runs:
    // aaab -> [aa, ab] (2 pieces), ab -> [ab] -> 2+2+1 = 5.
    val docs = Seq((1L, "aaab aaab ab"), (2L, "")).toDF("doc_id", "text")
    val got3 = TextOps.bpeEncodedCounts(docs, "doc_id", "text", merges = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got3 == Set((1L, 3L, 3L), (2L, 0L, 0L)))
    val got2 = TextOps.bpeEncodedCounts(docs, "doc_id", "text", merges = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == Set((1L, 3L, 5L), (2L, 0L, 0L)))
  }

  test("bpeEncodeFromArtifact: replayed merges match training segmentation; OOV tokens still segment") {
    import spark.implicits._
    val train = Seq("aaab aaab ab").toDF("text")
    val path = ScratchDirs.scratch("t_bpe_artifact")
    TextOps.writeBpeArtifact(train, "text", merges = 3, path)
    assert(TextOps.readBpeMerges(spark, path) == Seq("a a", "a b", "aa ab"))
    // in-vocab tokens segment exactly as training did (see
    // bpeEncodedCounts: aaab→1 piece, ab→1 piece); OOV tokens replay
    // the same merges: "aab"→[a,a,b]→[aa,b]→"a b" no (" a b " gone
    // after round 0 consumed " a a ") → [aa, b] = 2 pieces; "xy"
    // matches no merge → 2 single-char pieces
    val serve = Seq((1L, "aaab ab"), (2L, "aab xy"), (3L, "")).toDF("doc_id", "text")
    val got = TextOps.bpeEncodeFromArtifact(serve, "doc_id", "text", path)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L), (2L, 2L, 4L), (3L, 0L, 0L)))
  }

  test("extendBpeArtifact: frozen ranks unchanged, new rounds train on the replayed grown corpus") {
    import spark.implicits._
    val path = ScratchDirs.scratch("t_bpe_extend")
    TextOps.writeBpeArtifact(Seq("aaab aaab ab").toDF("text"), "text",
      merges = 2, path)
    // grown corpus: replay gives aaab→[aa,ab] (c=2, pair (aa,ab)×2),
    // ab→[ab] (no pair), cd→[c,d] (c=3, pair (c,d)×3) → best "c d"
    val got = TextOps.extendBpeArtifact(
        Seq("aaab aaab ab cd cd cd").toDF("text"), "text",
        moreMerges = 1, path)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, "a a", 4L), (1L, "a b", 3L), (2L, "c d", 3L)))
    assert(TextOps.readBpeMerges(spark, path) == Seq("a a", "a b", "c d"))
  }

  test("bpeDecodeRoundTrip: decode(encode(x)) equals normalized x on every sf0.001 doc") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val got = TextOps.bpeDecodeRoundTrip(docs, "doc_id", "text", merges = 6)
    val n = got.count()
    val ok = got.filter(col("round_trip_ok") === 1L).count()
    assert(n > 0 && ok == n, s"round trip broke on ${n - ok} of $n docs")
    // decoded text IS the normalization, not merely same-length
    val row = got.orderBy("id").select("decoded").as[String].head()
    assert(row.nonEmpty && !row.exists(_.isUpper))
  }

  test("bpeTrain stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq("ab ab").toDF("text") // one 2-char token: 1 merge possible
    val got = TextOps.bpeTrain(docs, "text", merges = 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((0L, "a b", 2L)))
  }

  test("slidingChunks: stride windows overlap; short docs emit one window") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), // 5 tokens, chunk 3 stride 2 → starts 0,2,4
      (2L, "x y"),       // shorter than one chunk → one window
      (3L, "")           // no tokens → no rows
    ).toDF("doc_id", "text")
    val got = TextOps.slidingChunks(docs, "doc_id", "text",
        chunkTokens = 3, strideTokens = 2)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 0L, "a b c"), (1L, 1L, "c d e"), (1L, 2L, "e"),
      (2L, 0L, "x y")))
  }

  test("gopherRules: each rule fails independently; pass is the conjunction") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat is in the house and it runs to it for fun"), // all pass
      (2L, "zzzzzzzzzz qqqqqqqq"), // too short, too-long words, no stops
      (3L, "")                     // empty: every rule fails
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs, "doc_id", "text",
        stopwords = TextOps.langMarkers.head._2, minTokens = 5,
        maxTokens = 20, minMeanLen = 2.0, maxMeanLen = 4.0, minStopHits = 2)
      .select("id", "len_ok", "word_len_ok", "stop_ok", "pass")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((1L, 1L, 1L, 1L))) // 13 toks, mean 2.8462, 7 stop hits
    assert(got(2L) == ((0L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L))) // empty → mean 0.0 fails the band
  }
}
