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
}
