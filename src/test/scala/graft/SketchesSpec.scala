package graft

import org.apache.spark.sql.functions._

import graft.text.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bottomK keeps exactly the k smallest distinct hashes") {
    val df = (1 to 200).map(i => ("g", s"doc $i")) ++
      (1 to 200).map(i => ("g", s"doc $i")) // duplicates must not eat slots
    val sk = Sketches.bottomK(df.toDF("source", "text"), "source", "text", k = 16)
      .select("sketch").as[Seq[Long]].head()
    assert(sk.length == 16)
    assert(sk == sk.sorted)
    // exhaustive check: these ARE the 16 smallest of the 200 distinct
    val all = (1 to 200).map(i => s"doc $i").toDF("text")
      .select(Sketches.h52($"text").as("h")).as[Long].collect().sorted
    assert(sk == all.take(16).toSeq)
  }

  test("distinctEstimate: exact below k, within 30% above k") {
    val small = (1 to 40).map(i => ("s", s"u $i")).toDF("source", "text")
    val smallEst = Sketches.distinctEstimate(small, "source", "text", k = 64)
      .select("n_sketch", "est_distinct").as[(Int, Double)].head()
    assert(smallEst == ((40, 40.0))) // sketch not full → exact count
    val big = (1 to 5000).map(i => ("b", s"item $i")).toDF("source", "text")
    val est = Sketches.distinctEstimate(big, "source", "text", k = 64)
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - 5000) / 5000 < 0.30, s"KMV estimate $est for 5000")
  }

  test("cmsHeavyHitters: one-sided estimates, exact when cells don't collide") {
    // 3 tokens with known counts; w=256 over a 3-token vocab makes
    // per-row collisions implausible, so min-over-rows is EXACT here
    val docs = Seq((1L, "alpha alpha alpha beta beta gamma"),
      (2L, "alpha beta gamma gamma")).toDF("doc_id", "text")
    val got = Sketches.cmsHeavyHitters(docs, "text", d = 4, w = 256, topN = 3)
      .select("tok", "true_cnt", "cms_est").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("alpha" -> ((4L, 4L)), "beta" -> ((3L, 3L)),
      "gamma" -> ((3L, 3L))))
    // with w=2 collisions are forced: estimates stay ONE-SIDED (≥ true)
    val crowded = Sketches.cmsHeavyHitters(docs, "text", d = 2, w = 2, topN = 3)
      .select("true_cnt", "cms_est").as[(Long, Long)].collect()
    assert(crowded.nonEmpty && crowded.forall { case (t, e) => e >= t })
  }

  test("histogramQuantiles: planted uniform 1..100 hits the known bucket edges") {
    // width 10 over values 1..100: bucket b holds [10b, 10b+9];
    // cum(b=4)=49 < 50 ≤ cum(b=5) → p50 lower edge 50; p90 → 90; p99 → 90
    val df = (1 to 100).map(i => ("a", i.toLong)).toDF("source", "n")
    val got = Sketches.histogramQuantiles(df, "source", col("n"),
        width = 10, qs = Seq(0.5, 0.9, 0.99))
      .select("q", "n_rows", "bucket_lo").as[(Double, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(0.5 -> ((100L, 50L)), 0.9 -> ((100L, 90L)),
      0.99 -> ((100L, 90L))))
    // two groups stay independent; a constant group lands in one bucket
    val two = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 40).map(_ => ("b", 7L))).toDF("source", "n")
    val gotB = Sketches.histogramQuantiles(two, "source", col("n"),
        width = 10, qs = Seq(0.5))
      .select("source", "n_rows", "bucket_lo").as[(String, Long, Long)]
      .collect().toSet
    assert(gotB == Set(("a", 100L, 50L), ("b", 40L, 0L)))
  }

  test("jaccardOverlap recovers a planted overlap fraction in sketch space") {
    // A = {1..1000}, B = {501..1500}: true J = 500/1500 = 1/3
    val rows = (1 to 1000).map(i => ("a", s"v $i")) ++
      (501 to 1500).map(i => ("b", s"v $i"))
    val got = Sketches.jaccardOverlap(rows.toDF("source", "text"),
        "source", "text", k = 256)
      .select("group_a", "group_b", "k_used", "jaccard_est")
      .as[(String, String, Long, Double)].collect()
    assert(got.length == 1)
    val (ga, gb, kUsed, j) = got.head
    assert(ga == "a" && gb == "b" && kUsed == 256)
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"sketch Jaccard $j vs 1/3")
    // disjoint groups → 0 exactly
    val disj = (1 to 300).map(i => ("x", s"p $i")) ++
      (1 to 300).map(i => ("y", s"q $i"))
    val j0 = Sketches.jaccardOverlap(disj.toDF("source", "text"),
      "source", "text", k = 64).select("jaccard_est").as[Double].head()
    assert(j0 == 0.0)
  }

  test("histPercentileCalibration: one pct threshold keeps the same share of differently-scaled groups") {
    import org.apache.spark.sql.functions.col
    // group a scores cluster low (0.0..0.2), group b high (0.7..0.9):
    // an absolute threshold keeps none of a / all of b; the calibrated
    // percentile keeps the top half of EACH
    val rows = (0 until 100).map(i => (i.toLong, "a", 0.002 * i)) ++
      (100 until 200).map(i => (i.toLong, "b", 0.7 + 0.002 * (i - 100)))
    val got = Sketches.histPercentileCalibration(
        rows.toDF("id", "source", "score"), width = 20)
      .as[(Long, String, Double, Double)].collect()
    val keep = got.filter(_._4 >= 0.5)
    // ±1: double bucket edges (0.7 + 0.05 lands at 0.749999…) may move
    // one edge row — the calibration property, not exact bucketing, is
    // under test here
    assert(math.abs(keep.count(_._2 == "a") - 50) <= 1 &&
      math.abs(keep.count(_._2 == "b") - 50) <= 1)
    // percentile is monotone in the score within each group's buckets
    val aSorted = got.filter(_._2 == "a").sortBy(_._3).map(_._4)
    assert(aSorted.zip(aSorted.tail).forall { case (x, y) => x <= y })
    // exact CDF arithmetic: bucket 0 of group a holds scores < 0.05
    // (25 rows) → pct = (0 + 12.5) / 100
    assert(got.filter(r => r._2 == "a" && r._3 < 0.05)
      .forall(_._4 == 0.125))
  }

  test("PackedHll: 5-bit register round-trip, order-free max merge, Ertl estimate within tolerance at every range") {
    import graft.functions.PackedHll
    val lgK = 9
    // register get/set round-trip across byte boundaries (5-bit regs
    // straddle bytes at every alignment over a 16-register window)
    val b = new Array[Byte](PackedHll.numBytes(lgK)); b(0) = lgK.toByte
    val vals = Seq(0, 31, 1, 17, 5, 30, 2, 9, 31, 0, 13, 7, 21, 4, 29, 16)
    vals.zipWithIndex.foreach { case (v, j) => PackedHll.setReg(b, j, v) }
    assert(vals.indices.forall(j => PackedHll.getReg(b, j) == vals(j)))
    // neighbouring registers untouched by interleaved writes
    assert(PackedHll.getReg(b, 16) == 0)
    // merge = per-register max, commutative and idempotent
    def sk(ids: Seq[Long]): Array[Byte] = {
      val acc = new Array[Byte](PackedHll.numBytes(lgK)); acc(0) = lgK.toByte
      ids.foreach(i => PackedHll.maxMerge(acc, PackedHll.singleton(i, lgK)))
      acc
    }
    val a1 = sk(1L to 100L)
    val a2 = sk((100L to 1L by -1L))
    assert(a1.toSeq == a2.toSeq, "merge order must not matter")
    PackedHll.maxMerge(a1, a2)
    assert(a1.toSeq == a2.toSeq, "self-union must be identity")
    // sparse wire round-trip: a lightly-occupied file goes sparse and
    // densifies back identically; a saturated one stays dense
    val light = sk(1L to 20L)
    val wire = PackedHll.maybeSparse(light)
    assert(wire(0) < 0 && wire.length < light.length,
      s"20-element file must ship sparse (${wire.length} vs ${light.length})")
    assert(PackedHll.toDense(wire).toSeq == light.toSeq)
    val heavy = sk(1L to 100000L)
    assert(PackedHll.maybeSparse(heavy) eq heavy,
      "saturated file must stay dense")
    // singleton is the 6-byte sparse seed
    assert(PackedHll.singleton(42L, lgK).length == 6)
    // estimate accuracy: small range is near-exact, larger ranges stay
    // inside the estimator's theoretical band (1.04/sqrt(512) ~ 4.6%
    // RSE; 15% here is > 3 sigma — deterministic, not flaky)
    for (n <- Seq(10, 100, 1000, 20000, 300000)) {
      val est = PackedHll.estimate(sk((1L to n.toLong).map(_ * 7919L)))
      assert(math.abs(est - n) / n <= 0.15,
        s"n=$n estimated $est (err ${math.abs(est - n) / n})")
    }
  }
}
