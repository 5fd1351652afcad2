package graft

import org.apache.spark.sql.functions._

import graft.text.Sampling

/** Deterministic sampling/upsampling semantics. */
class SamplingSpec extends SparkSpec {

  test("hashBucket is stable and within range; splitLabel covers all docs") {
    import spark.implicits._
    val df = (1 to 50).map(i => s"document number $i").toDF("text")
    val b = df.select(Sampling.hashBucket(col("text"), 10).as("b"))
      .as[Int].collect()
    assert(b.forall(x => x >= 0 && x < 10))
    // re-running yields identical buckets (content-keyed, no RNG)
    val b2 = df.select(Sampling.hashBucket(col("text"), 10).as("b"))
      .as[Int].collect()
    assert(b.toSeq === b2.toSeq)
    val splits = df.select(Sampling.splitLabel(col("text")).as("s"))
      .as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("splitLabel fractions approximate the documented 70/10/20") {
    import spark.implicits._
    // 32-bit-hash buckets are uniform (the single-nibble form they
    // replaced skewed to ~62.5/12.5/25 at nBuckets=10)
    val n = 4000
    val frac = (1 to n).map(i => s"doc $i").toDF("text")
      .groupBy(Sampling.splitLabel(col("text")).as("s")).count()
      .as[(String, Long)].collect().toMap.view.mapValues(_.toDouble / n).toMap
    assert(math.abs(frac("train") - 0.7) < 0.03, s"train=${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.02, s"val=${frac("val")}")
    assert(math.abs(frac("test") - 0.2) < 0.03, s"test=${frac("test")}")
  }

  test("stratifiedSample applies per-stratum rates deterministically") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr",
      s"text number $i")).toDF("id", "lang", "text")
    val kept = Sampling.stratifiedSample(df, "lang", col("text"),
      Map("en" -> 0.25))
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("fr") === 1000L) // default rate 1.0 keeps everything
    assert(math.abs(byLang("en") - 250L) < 60, s"en=${byLang("en")}")
    // content-keyed: identical on re-run
    val again = Sampling.stratifiedSample(df, "lang", col("text"),
      Map("en" -> 0.25)).select("id").as[Long].collect().toSet
    assert(again === kept.select("id").as[Long].collect().toSet)
  }

  test("targetMix realizes token shares: cap at 1, partial rate, unlisted source dropped") {
    import spark.implicits._
    // each doc = 10 tokens; sources a/b/c have 1000/4000/1000 docs
    def doc(i: Long, src: String) =
      (i, src, s"tok$i a b c d e f g h i")
    val df = ((1L to 1000L).map(doc(_, "a")) ++
      (2001L to 6000L).map(doc(_, "b")) ++
      (9001L to 10000L).map(doc(_, "c")))
      .toDF("id", "src", "text")
    val toks = graft.text.TextOps.tokenCount(col("text")).cast("long")
    // budget 100k tokens: a→30% (30k > its 10k → rate 1, keep all);
    // b→10% (10k of 40k → rate 0.25); c unlisted → dropped
    val kept = Sampling.targetMix(df, "src", toks, col("text"),
      Map("a" -> 30, "b" -> 10), budgetTokens = 100000L)
    val bySrc = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("a") == 1000L)
    assert(math.abs(bySrc("b") - 1000L) < 150, s"b=${bySrc("b")}")
    assert(!bySrc.contains("c"))
    // deterministic: identical keep set on re-run
    val again = Sampling.targetMix(df, "src", toks, col("text"),
      Map("a" -> 30, "b" -> 10), budgetTokens = 100000L)
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("temperatureMix keeps small strata whole, downsamples large toward sqrt ratio") {
    import spark.implicits._
    val df = ((1 to 4000).map(i => (i.toLong, "big", s"text $i")) ++
      (1 to 250).map(i => (i.toLong + 10000, "small", s"other $i")))
      .toDF("id", "src", "text")
    val kept = Sampling.temperatureMix(df, "src", col("text"))
    val bySrc = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    // smallest stratum: q = 1 → every row survives
    assert(bySrc("small") === 250L)
    // big stratum: q = sqrt(250/4000) = 0.25 → ~1000 of 4000 (hash noise)
    assert(math.abs(bySrc("big") - 1000L) < 120, s"big=${bySrc("big")}")
    // content-keyed: identical keep set on re-run
    val again = Sampling.temperatureMix(df, "src", col("text"))
      .select("id").as[Long].collect().toSet
    assert(again === kept.select("id").as[Long].collect().toSet)
    // null strata: kept whole AND excluded from n_min (two unattributed
    // rows must not become the reference minimum and crush 'big')
    val withNull = df.unionByName(Seq((20001L, null.asInstanceOf[String], "x1"),
      (20002L, null.asInstanceOf[String], "x2")).toDF("id", "src", "text"))
    val keptN = Sampling.temperatureMix(withNull, "src", col("text"))
    assert(keptN.filter(col("src").isNull).count() === 2L)
    val bigN = keptN.filter(col("src") === "big").count()
    assert(math.abs(bigN - 1000L) < 120, s"null stratum skewed n_min: big=$bigN")
  }

  test("shuffleShards: deterministic permutation, dense per-shard positions, salt reshuffles") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val a = Sampling.shuffleShards(df, "id", nShards = 8, salt = "e0")
    val rows = a.select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(rows.length === 500 && rows.map(_._1).toSet.size === 500)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are a dense 1..n ranking within every shard
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq === (1 to g.length).toSeq)
    }
    // content-keyed: identical on re-run …
    val b = Sampling.shuffleShards(df, "id", nShards = 8, salt = "e0")
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(rows.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    // … and the shard order is not the id order (it IS a shuffle)
    val firstShardIds = rows.filter(_._2 == rows.head._2).sortBy(_._3).map(_._1)
    assert(firstShardIds.toSeq !== firstShardIds.sorted.toSeq)
    // a different salt yields a different permutation (epoch reshuffle)
    val c = Sampling.shuffleShards(df, "id", nShards = 8, salt = "e1")
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(c.sortBy(_._1).map(t => (t._2, t._3)).toSeq !==
      rows.sortBy(_._1).map(t => (t._2, t._3)).toSeq)
  }

  test("upsample emits exactly weight copies; weights < 1 emit nothing") {
    import spark.implicits._
    val df = Seq((1L, 3), (2L, 1), (3L, 0), (4L, -2)).toDF("id", "w")
    val got = Sampling.upsample(df, col("w"))
      .groupBy("id").agg(count(lit(1)).as("n"), max("copy_no").as("mx"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((3L, 3)), 2L -> ((1L, 1))))
    // ids 3 and 4 (weight 0 / negative) produce no rows at all
    assert(!got.contains(3L) && !got.contains(4L))
  }

  test("sampleKPerGroup: exactly k per stratum, stable under corpus growth") {
    import spark.implicits._
    def corpus(n: Int) = (1 to n).map(i => (s"src${i % 3}", i.toLong))
      .toDF("source", "doc_id")
    val k = 8
    val small = Sampling.sampleKPerGroup(corpus(99), "source", "doc_id", k)
      .as[(String, Long, Int)].collect()
    val big = Sampling.sampleKPerGroup(corpus(300), "source", "doc_id", k)
      .as[(String, Long, Int)].collect()
    // exactly k rows per stratum, ranks dense 1..k
    Seq(small, big).foreach { s =>
      s.groupBy(_._1).foreach { case (_, rows) =>
        assert(rows.length == k)
        assert(rows.map(_._3).sorted.toSeq == (1 to k))
      }
    }
    // bottom-k stability: a doc sampled from the GROWN corpus that
    // already existed in the small corpus must have been sampled there
    // too (growth can only evict, never admit, among old rows)
    val smallSet = small.map(r => (r._1, r._2)).toSet
    big.filter(_._2 <= 99).foreach { r =>
      assert(smallSet.contains((r._1, r._2)), s"unstable sample row $r")
    }
  }

  test("weightedReservoir: k per stratum, matches the declarative A-ES selection") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val corpus = (1 to 120)
      .map(i => (s"src${i % 3}", i.toLong, (i % 7 + 1) * 100L))
      .toDF("source", "doc_id", "n_chars")
    val k = 5
    val got = Sampling.weightedReservoir(corpus, "source", "doc_id",
        col("n_chars"), k)
      .select("source", "doc_id", "sample_rank")
      .as[(String, Long, Int)].collect().toSet
    // declarative recomputation of the same keys via a window —
    // pins the TopK-aggregator path against the textbook formulation
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(4503599627370497.0)
    val expected = corpus
      .withColumn("__key", -log(u) / col("n_chars").cast("double"))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy("source").orderBy(col("__key"), col("doc_id"))))
      .filter(col("sample_rank") <= k)
      .select("source", "doc_id", "sample_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(got === expected)
    assert(got.groupBy(_._1).forall(_._2.size == k))
  }

  test("epochShuffle: every epoch is a complete permutation with a fresh order") {
    import spark.implicits._
    val corpus = (1L to 200L).toDF("doc_id")
    val got = Sampling.epochShuffle(corpus, "doc_id", nShards = 4, epochs = 3)
      .as[(Int, Int, Int, Long)].collect()
    // each epoch covers every doc exactly once
    (0 until 3).foreach { e =>
      val rows = got.filter(_._1 == e)
      assert(rows.map(_._4).toSet === (1L to 200L).toSet)
      // positions dense 1..n within each (epoch, shard) cell
      rows.groupBy(_._2).foreach { case (_, cell) =>
        assert(cell.map(_._3).sorted.toSeq === (1 to cell.length))
      }
    }
    // epochs produce genuinely different global orders AND different
    // shard membership (the hash covers the epoch)
    def order(e: Int) = got.filter(_._1 == e).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(order(0) !== order(1))
    def shardOf(e: Int) = got.filter(_._1 == e).map(r => r._4 -> r._2).toMap
    assert(shardOf(0) !== shardOf(1))
    // re-running yields the identical assignment (pure function, no RNG)
    val again = Sampling.epochShuffle(corpus, "doc_id", nShards = 4, epochs = 3)
      .as[(Int, Int, Int, Long)].collect()
    assert(got.sorted.toSeq === again.sorted.toSeq)
  }

  test("weightedReservoir: a vastly heavier row always wins rank 1") {
    import spark.implicits._
    // same u-pool, one row with weight 10^9 vs peers at 1 — its key
    // is ~9 orders of magnitude smaller than any peer's
    val corpus = (1 to 50)
      .map(i => ("s", i.toLong, if (i == 37) 1000000000L else 1L))
      .toDF("source", "doc_id", "w")
    val top = Sampling.weightedReservoir(corpus, "source", "doc_id",
        col("w"), k = 1)
      .select("doc_id").as[Long].head()
    assert(top === 37L)
  }

  test("packSequences: spans split at boundaries, every non-final sequence full") {
    import spark.implicits._
    // stream A: docs of 3,4,5 tokens, seqLen 4 →
    //   doc1 [0,3) seq0; doc2 [3,7) seq0+seq1; doc3 [7,12) seq1+seq2
    val docs = Seq(
      ("A", 1L, "a b c"), ("A", 2L, "d e f g"), ("A", 3L, "h i j k l"),
      ("B", 4L, "x y"), ("B", 5L, "")
    ).toDF("source", "doc_id", "text")
    val got = Sampling.packSequences(docs, "source", "doc_id", "text", seqLen = 4)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("A", 1L, 0L, 3L), ("A", 2L, 0L, 1L), ("A", 2L, 1L, 3L),
      ("A", 3L, 1L, 1L), ("A", 3L, 2L, 4L),
      ("B", 4L, 0L, 2L)))
    // per-sequence totals: every sequence except the stream's last is
    // exactly seqLen
    val bySeq = got.toSeq.groupBy(t => (t._1, t._3))
      .view.mapValues(_.map(_._4).sum).toMap
    assert(bySeq == Map(("A", 0L) -> 4L, ("A", 1L) -> 4L, ("A", 2L) -> 4L,
      ("B", 0L) -> 2L))
  }

  test("budgetSelect: best-score-first, boundary row admitted while budget unspent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // score 3: ids 1,2 (w 10, 10); score 2: ids 3,4 (w 15, 50); score 1: id 5
    val rows = Seq((1L, 3L, 10L), (2L, 3L, 10L), (3L, 2L, 15L),
      (4L, 2L, 50L), (5L, 1L, 100L)).toDF("doc_id", "s", "w")
    def sel(b: Long) =
      Sampling.budgetSelect(rows, "doc_id", col("s"), col("w"), b)
        .as[(Long, Long, Long)].collect().map(_._1).toSet
    // budget 30: score-3 group (20) fully in; id 3 enters at cum 20 < 30
    // (overshoots to 35 — allowed, budget was unspent); id 4 at 35 ≥ 30 out
    assert(sel(30L) == Set(1L, 2L, 3L))
    // budget 20: score-3 group consumes it exactly; cum 20 not < 20
    assert(sel(20L) == Set(1L, 2L))
    // budget 1000: everything fits
    assert(sel(1000L) == Set(1L, 2L, 3L, 4L, 5L))
    // budget 5: only the first row of the best group
    assert(sel(5L) == Set(1L))
  }

  test("curriculumOrder: seq is a stage-monotone permutation; offsets match cell counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (1L to 100L).map(i => (i, (i % 10) / 10.0)).toDF("id", "score")
    val got = Sampling.curriculumOrder(docs, "id", col("score"),
        boundaries = Seq(0.3, 0.7), nShards = 4, salt = "t")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._4)
    // a permutation 1..N
    assert(got.map(_._4).toSeq == (1L to 100L))
    // stage assignment from the fixed thresholds
    val stageOf = got.map(r => r._1 -> r._2).toMap
    assert(stageOf(10L) == 0 && stageOf(3L) == 1 && stageOf(7L) == 2)
    // the global order visits (stage, shard) blocks in order
    val cells = got.map(r => (r._2, r._3)).toSeq
    assert(cells == cells.sorted)
    // deterministic across runs
    val again = Sampling.curriculumOrder(docs, "id", col("score"),
        boundaries = Seq(0.3, 0.7), nShards = 4, salt = "t")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._4)
    assert(got.toSeq == again.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.curriculumOrder(docs, "id", col("score"),
        boundaries = Seq(0.7, 0.3), nShards = 4, salt = "t")
    }
  }

  test("interleaveBySource: every prefix of the pos order holds each source's share within one row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 80 docs of source a, 20 of b → a 4:1 stride
    val docs = ((1L to 80L).map(i => (i, "a")) ++ (81L to 100L).map(i => (i, "b")))
      .toDF("id", "source")
    val sched = Sampling.interleaveBySource(docs, "id", "source",
        nShards = 4, salt = "t")
      .orderBy("pos", "source", "rank_in_source")
      .as[(Long, String, Long, Double)].collect()
    assert(sched.length == 100)
    // rank_in_source is a permutation per source
    assert(sched.filter(_._2 == "a").map(_._3).sorted.toSeq == (1L to 80L))
    // prefix-share property: at any cut, #b seen is within 1 of 20% of it
    var nB = 0
    sched.zipWithIndex.foreach { case ((_, src, _, _), i) =>
      if (src == "b") nB += 1
      assert(math.abs(nB - 0.2 * (i + 1)) <= 1.0,
        s"prefix ${i + 1}: $nB docs of b breaks the stride bound")
    }
    // deterministic across runs
    val again = Sampling.interleaveBySource(docs, "id", "source",
        nShards = 4, salt = "t")
      .orderBy("pos", "source", "rank_in_source")
      .as[(Long, String, Long, Double)].collect()
    assert(sched.toSeq == again.toSeq)
  }

  test("lengthBucketBatches: homogeneous buckets, bounded batches, exact padding math") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 40 docs of length ~bucket0 (0..63) and 10 of bucket2 (128..191)
    val docs = ((1L to 40L).map(i => (i, 30L + i % 20)) ++
      (41L to 50L).map(i => (i, 150L))).toDF("id", "len")
    val got = Sampling.lengthBucketBatches(docs, "id", col("len"),
        bucketWidth = 64, batchSize = 8, nShards = 2, salt = "t")
      .as[(Int, Int, Int, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set(0, 2))
    // every batch ≤ batchSize; counts conserve the corpus
    assert(got.forall(_._4 <= 8) && got.map(_._4).sum == 50)
    // padding arithmetic holds on every row; homogeneity: max_len in bucket
    got.foreach { case (b, _, _, n, mx, sm, waste) =>
      assert(waste == n * mx - sm)
      assert(mx / 64 == b)
    }
    // bucket 2 is constant-length → zero waste
    assert(got.filter(_._1 == 2).forall(_._7 == 0L))
    // batch indexes are dense from 0 within each cell
    got.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0 until rs.length).toSeq)
    }
  }

  test("dsirSelect: target-like raw docs outscore off-target ones; draw is deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target distribution: "alpha beta" docs; raw pool: some target-like,
    // some from a disjoint vocabulary
    val docs = (
      (1L to 20L).map(i => (i, "alpha beta alpha beta gamma", "t")) ++
      (21L to 25L).map(i => (i, "alpha beta gamma alpha beta", "r")) ++
      (26L to 30L).map(i => (i, "zq xv wk zq xv wk zq xv", "r"))).toDF("id", "text", "cls")
    val got = Sampling.dsirSelect(docs, "id", "text", col("cls") === "t",
        nBuckets = 64, k = 10)
      .as[(Long, Double, Double, Int)].collect().sortBy(_._4)
    // only raw docs are candidates; all 10 raw docs selected at k=10
    assert(got.length == 10 && got.forall(_._1 > 20L))
    // every target-like raw doc has a higher logw than every off-target one
    val (like, off) = got.partition(_._1 <= 25L)
    assert(like.map(_._2).min > off.map(_._2).max)
    // selection rank follows gumbel_key desc
    assert(got.map(-_._3).toSeq == got.map(-_._3).sorted.toSeq)
    // deterministic re-run
    val again = Sampling.dsirSelect(docs, "id", "text", col("cls") === "t",
        nBuckets = 64, k = 10)
      .as[(Long, Double, Double, Int)].collect().sortBy(_._4)
    assert(got.toSeq == again.toSeq)
  }

  test("dsirScore from the persisted LM: artifact round-trip equals in-memory ratio; unseen buckets get lw0; plan is join-free") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (
      (1L to 20L).map(i => (i, "alpha beta alpha beta gamma", "t")) ++
      (21L to 25L).map(i => (i, "alpha beta gamma alpha beta", "r")) ++
      (26L to 30L).map(i => (i, "zq xv wk zq xv wk zq xv", "r"))).toDF("id", "text", "cls")
    val path = ScratchDirs.scratch("t_dsir_lm")
    Sampling.writeDsirLm(docs, "text", col("cls") === "t",
      nBuckets = 64, path)
    val (lut, n) = Sampling.readDsirLut(spark, path)
    assert(n == 64 && lut.length == 64)
    val scored = docs.select(col("id"),
        Sampling.dsirScore(lut, n, col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    // target-vocab docs score positive, disjoint-vocab docs negative
    assert((1L to 25L).forall(scored(_) > 0) &&
      (26L to 30L).forall(scored(_) < 0))
    // unseen token = unseen bucket → the zero-count default, not a
    // crash/skip — recomputed here from the stored counts
    val (tt, rt) = spark.read.parquet(s"$path/buckets")
      .agg(sum("tc"), sum("rc")).as[(Long, Long)].collect()(0)
    val lw0 = math.log(1.0 / (tt + 64)) - math.log(1.0 / (rt + 64))
    val unseen = Seq((99L, "qqqqzzzz")).toDF("id", "text")
      .select(Sampling.dsirScore(lut, n, col("text")).as("s"))
      .as[Double].collect()(0)
    assert(math.abs(unseen - lw0) < 1e-12)
    // the serve is scan-stage: no join, no explode-generate in the plan
    val plan = docs.select(Sampling.dsirScore(lut, n, col("text")))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("join") && !plan.contains("generate"))
    // incremental append: half-train + append(other half) ≡ full train
    // (counts are additive — the artifact grows by parquet append)
    val path2 = ScratchDirs.scratch("t_dsir_lm_grow")
    Sampling.writeDsirLm(docs.filter(col("id") % 2 === 0), "text",
      col("cls") === "t", nBuckets = 64, path2)
    Sampling.appendDsirLm(docs.filter(col("id") % 2 =!= 0), "text",
      col("cls") === "t", path2)
    val (lut2, n2) = Sampling.readDsirLut(spark, path2)
    assert(n2 == 64 && lut2.toSeq == lut.toSeq)
  }

  test("historySequences: full sliding windows in event order, stride offsets, partial tails dropped") {
    import spark.implicits._
    // one user, 10 events with shuffled input order; L=4, stride=2 →
    // full windows at ranks 1-4, 3-6, 5-8, 7-10
    val ev = (1L to 10L).map(i => (7L, i * 100L, i, s"e$i"))
      .sortBy(_._3 % 3) // scrambled input order
      .toDF("user_id", "ts", "event_id", "tok")
    val got = Sampling.historySequences(ev, "user_id", "ts", "event_id",
        "tok", seqLen = 4, stride = 2)
      .as[(Long, Int, String)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(got.map(_._3).toSeq == Seq(
      "e1 e2 e3 e4", "e3 e4 e5 e6", "e5 e6 e7 e8", "e7 e8 e9 e10"))
    // a user with fewer than seqLen events emits nothing
    val short = (1L to 3L).map(i => (9L, i, i, s"x$i"))
      .toDF("user_id", "ts", "event_id", "tok")
    assert(Sampling.historySequences(short, "user_id", "ts", "event_id",
      "tok", seqLen = 4, stride = 2).count() == 0L)
  }

  test("epochBudgetAllocation: hand-computed water-filling — binding cap, proportional rest, full saturation") {
    import spark.implicits._
    // A: uniq 10, w 10 → cap 40, rate 4; B: uniq 100, w 1 → cap 400,
    // rate 400. Budget 150: A saturates (4 epochs), B takes the
    // remaining 110 at 1.1 epochs
    val docs = (1 to 10).map(i => ("A", 1L)) ++ (1 to 10).map(i => ("B", 10L))
    val df = docs.toDF("source", "n")
    val w = when(col("source") === "A", 10L).otherwise(1L)
    val got = Sampling.epochBudgetAllocation(df, "source", col("n"), w,
        budget = 150L, maxEpochs = 4)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 10L, 10L, 40L, 1L, 40.0, 4.0)))
    assert(got("B") == (("B", 100L, 1L, 400L, 0L, 110.0, 1.1)))
    // budget above total capacity: everything saturates at maxEpochs
    val all = Sampling.epochBudgetAllocation(df, "source", col("n"), w,
        budget = 2000L, maxEpochs = 4)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(all.forall(r => r._5 == 1L && r._7 == 4.0))
  }

  test("mixtureSchedule: dyadic interpolation hits both endpoints, phases sum to 1, floors exact") {
    import spark.implicits._
    val w = Seq(("a", 0.75, 0.25), ("b", 0.25, 0.75))
      .toDF("source", "w_init", "w_final")
    val r = Sampling.mixtureSchedule(w, phases = 5, phaseBudget = 1000L)
      .orderBy("phase", "source")
      .as[(Int, String, Double, Long)].collect()
    assert(r.length == 10)
    // phase 0 = w_init, last phase = w_final, midpoint = the mean
    assert(r.filter(_._1 == 0).map(_._3).toSeq == Seq(0.75, 0.25))
    assert(r.filter(_._1 == 4).map(_._3).toSeq == Seq(0.25, 0.75))
    assert(r.filter(_._1 == 2).map(_._3).toSeq == Seq(0.5, 0.5))
    // every phase's weights sum to 1; allocations are exact floors
    (0 to 4).foreach { p =>
      assert(math.abs(r.filter(_._1 == p).map(_._3).sum - 1.0) < 1e-9)
    }
    assert(r.find(t => t._1 == 1 && t._2 == "a").get._4 == 625L)
  }

  test("mixFromSchedule: one-pass phase fan-out equals mixFromWeights run per phase") {
    import spark.implicits._
    val docs = Seq(("a", 1L, "w x y z"), ("a", 2L, "p q r s"),
      ("a", 3L, "k l m n"), ("b", 4L, "t u v w"), ("b", 5L, "c d i j"))
      .toDF("source", "doc_id", "text")
    val sched = Seq((0, "a", 0.3), (0, "b", 0.7), (1, "a", 0.9),
      (1, "b", 0.1)).toDF("phase", "source", "w")
    val onePass = Sampling.mixFromSchedule(docs, "source", lit(4L),
        col("text"), sched, budgetTokens = 10L)
      .select("phase", "source", "doc_id")
      .as[(Int, String, Long)].collect().toSet
    val perPhase = (0 to 1).flatMap { p =>
      Sampling.mixFromWeights(docs, "source", lit(4L), col("text"),
          sched.filter(col("phase") === p).select("source", "w"),
          budgetTokens = 10L)
        .select("source", "doc_id").as[(String, Long)].collect()
        .map(t => (p, t._1, t._2))
    }.toSet
    assert(onePass == perPhase)
  }

  test("mixFromWeights: budget binds per source, rate caps at 1, hash-keep matches hand thresholds") {
    import spark.implicits._
    // source a: 4 docs x 4 tokens = 16; source b: 2 docs x 4 tokens = 8
    val docs = Seq(("a", 1L, "w x y z"), ("a", 2L, "p q r s"),
      ("a", 3L, "k l m n"), ("a", 4L, "e f g h"),
      ("b", 5L, "t u v w"), ("b", 6L, "c d i j"))
      .toDF("source", "doc_id", "text")
    val w = Seq(("a", 0.25), ("b", 0.75)).toDF("source", "w")
    // budget 8: a's rate = min(1, 8*.25/16) = 0.125; b's = min(1, 6/8) = 0.75
    val kept = Sampling.mixFromWeights(docs, "source",
        lit(4L), col("text"), w, budgetTokens = 8L)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    val handKept = docs.select(col("source"), col("doc_id"),
        Sampling.hashBucket(col("text"), 1000000).as("b"))
      .as[(String, Long, Int)].collect()
      .filter { case (s, _, b) => b < (if (s == "a") 125000L else 750000L) }
      .map(t => (t._1, t._2)).toSet
    assert(kept == handKept)
    // budget >= corpus: every rate caps at 1.0, everything kept
    val all = Sampling.mixFromWeights(docs, "source",
        lit(4L), col("text"), w, budgetTokens = 1000L)
    assert(all.count() == 6)
    // a source absent from the weights table is dropped, not kept
    val wOnlyB = Seq(("b", 1.0)).toDF("source", "w")
    val onlyB = Sampling.mixFromWeights(docs, "source",
        lit(4L), col("text"), wOnlyB, budgetTokens = 1000L)
      .select("source").distinct().as[String].collect().toSeq
    assert(onlyB == Seq("b"))
  }

  test("domainReweight: normalized weights tilt toward the lossy domain, deterministic") {
    import spark.implicits._
    // equal-size sources: a repeats one token (surprisal ln 2), b's
    // are all unique (ln 16) — the multiplicative updates must move
    // mass to b while the weights keep summing to 1
    val docs = Seq(("a", "x x x x"), ("a", "x x x x"),
      ("b", "p q r s"), ("b", "t u v w")).toDF("source", "text")
    val r = Sampling.domainReweight(docs, "source", "text",
        eta = 0.5, rounds = 3)
      .orderBy("source")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(r.map(_._1).toSeq == Seq("a", "b"))
    assert(r.forall(_._2 == 8L))
    assert(r.map(_._4).toSeq == Seq(0.5, 0.5))          // w_init ∝ size
    assert(math.abs(r.map(_._5).sum - 1.0) < 1e-5)      // normalized
    assert(r(1)._5 > r(0)._5)                           // b gains mass
    assert(math.abs(r(0)._3 - math.rint(math.log(2) * 1e6) / 1e6) < 1e-9)
    val again = Sampling.domainReweight(docs, "source", "text",
        eta = 0.5, rounds = 3)
      .orderBy("source")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(again.toSeq == r.toSeq)
  }
}
