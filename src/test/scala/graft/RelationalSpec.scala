package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("argmaxFields picks the max column; ties go to FIRST field in order") {
    val df = Seq(
      (1, 5, 3),   // b wins
      (2, 7, 7),   // b/c tie -> b (first max in field order)
      (4, 4, 4),   // all tie -> a
      (0, 1, 9)    // c wins
    ).toDF("a", "b", "c")
    val got = df.coalesce(1)
      .withColumn("m", Relational.argmaxFields(Seq("a", "b", "c")))
      .select("m").as[String].collect().toSeq
    assert(got == Seq("b", "b", "a", "c"))
  }

  test("dedupLatest keeps exactly the max-order row per partition key") {
    val df = Seq(
      (1, "2020-01-01", "old"),
      (1, "2021-01-01", "new"),
      (2, "2019-06-01", "only")
    ).toDF("k", "d", "tag")
    val got = Relational.dedupLatest(df, Seq("k"), Seq(col("d").desc))
      .select("k", "tag").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "new", 2 -> "only"))
  }

  test("topKByCount returns count-desc with key tie-break") {
    val df = Seq("x", "x", "x", "y", "y", "z").toDF("k")
    val got = Relational.topKByCount(df, Seq("k"), 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 3L), ("y", 2L)))
  }

  test("unionTagged aligns schemas by name and tags rows") {
    val a = Seq((1, "n1")).toDF("id", "name")
    val b = Seq((2, "n2")).toDF("id", "name")
    val got = Relational.unionTagged(a, "A", b, "B")
      .select("id", "type").as[(Int, String)].collect().toSet
    assert(got == Set((1, "A"), (2, "B")))
  }

  test("semiRestrict/antiExclude partition the table") {
    val df = Seq(1, 2, 3, 4).toDF("id")
    val keep = Seq(2, 4).toDF("id")
    val semi = Relational.semiRestrict(df, keep, Seq("id")).as[Int].collect().toSet
    val anti = Relational.antiExclude(df, keep, Seq("id")).as[Int].collect().toSet
    assert(semi == Set(2, 4) && anti == Set(1, 3))
  }

  test("asofJoin attaches the latest right row at-or-before each left ts") {
    val purchases = Seq((10L, 1, 100L), (11L, 1, 50L), (12L, 2, 100L))
      .toDF("pid", "user", "pts")
    val clicks = Seq((20L, 1, 40L), (21L, 1, 90L), (22L, 1, 150L), (23L, 3, 10L),
        (24L, 1, 100L), (25L, 1, 100L))
      .toDF("cid", "user", "cts")
    val got = Relational.asofJoin(purchases, clicks, Seq("user"),
        leftTs = "pts", rightTs = "cts", rightTieBreak = Seq("cid"))
      .select("pid", "cid").as[(Long, Long)].collect().toMap
    // pid 10 @100 → cid 25 (inclusive boundary; tie at ts=100 broken by
    // max cid); pid 11 @50 → click 20 @40; pid 12 (user 2, no clicks)
    // dropped; click 22 @150 is in the future
    assert(got == Map(10L -> 25L, 11L -> 20L))
  }

  test("sweepLineCounts computes the interval-coverage step function") {
    // intervals (inclusive): [1,3], [2,2], [5,5]; null endpoints dropped
    val iv = Seq(
      (Some("2020-01-01"), Some("2020-01-03")),
      (Some("2020-01-02"), Some("2020-01-02")),
      (Some("2020-01-05"), Some("2020-01-05")),
      (None, Some("2020-01-09")),
      (Some("2020-01-09"), None)
    ).toDF("s", "e").select(to_date(col("s")).as("s"), to_date(col("e")).as("e"))
    val got = Relational.sweepLineCounts(iv, "s", "e")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("open_cnt"))
      .as[(String, Long)].collect().toMap
    // breakpoints: 01(+1)=1, 02(+1)=2, 03(-1 for [2,2])=1, 04(end of
    // [1,3])=0, 05(+1)=1, 06(end)=0 — null rows contribute nothing
    assert(got == Map("2020-01-01" -> 1L, "2020-01-02" -> 2L,
      "2020-01-03" -> 1L, "2020-01-04" -> 0L, "2020-01-05" -> 1L,
      "2020-01-06" -> 0L))
  }

  test("collectSortedSet produces sorted deterministic arrays") {
    val df = Seq((1, "b"), (1, "a"), (1, "b"), (2, "z")).toDF("k", "v")
    val got = Relational.collectSortedSet(df, "k", "v")
      .as[(Int, Seq[String])].collect().toMap
    assert(got == Map(1 -> Seq("a", "b"), 2 -> Seq("z")))
  }

  test("scd2Intervals chains versions per key; same-stamp ties follow tieBreak") {
    // key 1: v10 @ d1, v11 @ d2, v12 @ d2 (tie → v11 before v12);
    // key 2: single version stays current
    val df = Seq(
      (1L, 10L, "2020-01-01"), (1L, 12L, "2020-01-02"),
      (1L, 11L, "2020-01-02"), (2L, 20L, "2020-01-05")
    ).toDF("k", "ver", "d").select(col("k"), col("ver"), to_date(col("d")).as("d"))
    val got = Relational.scd2Intervals(df, Seq("k"), "d", tieBreak = Seq("ver"))
      .select(col("k"), col("ver"), date_format(col("valid_from"), "yyyy-MM-dd"),
        date_format(col("valid_to"), "yyyy-MM-dd"), col("is_current"))
      .as[(Long, Long, String, Option[String], Boolean)].collect().toSet
    assert(got == Set(
      (1L, 10L, "2020-01-01", Some("2020-01-02"), false),
      (1L, 11L, "2020-01-02", Some("2020-01-02"), false),
      (1L, 12L, "2020-01-02", None, true),
      (2L, 20L, "2020-01-05", None, true)))
  }
}
