package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming semantics via MemoryStream: the windowed agg
  * matches its batch twin, session windows split on gaps, and the
  * watermark drops late data. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
    Event(2, ts("2024-01-01 01:20:00"), 1, "click", 2.0),
    Event(3, ts("2024-01-01 07:00:00"), 2, "view", 3.0),
    Event(4, ts("2024-01-01 07:30:00"), 2, "click", 4.0))

  test("windowedTypeCounts matches the equivalent batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.windowedTypeCounts(in.toDF(), window = "6 hours")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm").as("w"),
          col("event_type"), col("cnt"), col("total_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(got === Set(
        ("2024-01-01 00:00", "click", 2L, 3.0),
        ("2024-01-01 06:00", "view", 1L, 3.0),
        ("2024-01-01 06:00", "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("watermark drops events later than the bound in append mode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.windowedTypeCounts(in.toDF(),
      window = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("win_wm")
      .outputMode("append").start()
    try {
      in.addData(Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // advance event time far past 00:xx + watermark → 00:00 window closes
      in.addData(Event(2, ts("2024-01-01 05:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // this one is 4h late — beyond the 1h watermark → dropped
      in.addData(Event(3, ts("2024-01-01 00:20:00"), 1, "click", 99.0))
      q.processAllAvailable()
      val closed = spark.table("win_wm")
        .select(date_format(col("win_start"), "HH:mm").as("w"), col("cnt"))
        .as[(String, Long)].collect().toMap
      assert(closed.get("00:00").contains(1L),
        s"late row must not re-open the 00:00 window: $closed")
    } finally q.stop()
  }

  test("sessionWindowStats groups by user with gap-based sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionWindowStats(in.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 1, "view", 2.0),  // same session
        Event(3, ts("2024-01-01 02:00:00"), 1, "click", 3.0), // new session
        Event(4, ts("2024-01-01 00:05:00"), 2, "click", 4.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got === Seq((1L, 1L, 3.0), (1L, 2L, 3.0), (2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("fileSource tails a parquet directory as an unbounded stream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stream-src").toString
    batch1.toDS().toDF().write.mode("append").parquet(dir)
    val q = graft.streaming.EventStreams.fileSource(spark, dir)
      .groupBy("user_id").count()
      .writeStream.format("memory").queryName("file_src")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_src").as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 2L, 2L -> 2L))
      // a NEW file arriving in the directory flows through incrementally
      Seq(Event(9, ts("2024-01-02 00:00:00"), 7, "view", 1.0))
        .toDS().toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(spark.table("file_src").as[(Long, Long)].collect().toMap
        === Map(1L -> 2L, 2L -> 2L, 7L -> 1L))
    } finally q.stop()
  }

  test("dedupByContent keeps first arrival per text, drops in-watermark replays") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.dedupByContent(
        in.toDF().toDF("doc_id", "ts", "text"), "text", "ts",
        watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2024-01-01 00:00:00"), "alpha"),
        (2L, ts("2024-01-01 00:05:00"), "beta"),
        (3L, ts("2024-01-01 00:10:00"), "alpha")) // replay within watermark
      q.processAllAvailable()
      // a later replay, still within the watermark of its original
      in.addData((4L, ts("2024-01-01 00:20:00"), "beta"))
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "alpha"), (2L, "beta")))
    } finally q.stop()
  }

  test("contaminationCounts flags streamed docs against a static benchmark gram set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val benchGrams = Seq("alpha beta gamma delta").toDF("ng") // one static 4-gram
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.contaminationCounts(
        in.toDF().toDF("doc_id", "text"), benchGrams, "doc_id", "text", n = 4)
      .writeStream.format("memory").queryName("contam_stream")
      .outputMode("complete").start()
    try {
      in.addData(
        (1L, "xx alpha beta gamma delta yy"), // contains the benchmark gram
        (2L, "alpha beta gamma zz delta"))    // no 4-gram overlap
      q.processAllAvailable()
      // a second micro-batch: another contaminated arrival updates state
      in.addData((3L, "alpha beta gamma delta"))
      q.processAllAvailable()
      val got = spark.table("contam_stream")
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 1L, 3L -> 1L)) // doc 2 is never flagged
    } finally q.stop()
  }

  test("semanticAdmission admits per-arrival, split-invariantly, against the persisted index") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val bench = emb.filter(col("vec_id") % 10 === 0)
    val path = graft.ScratchDirs.scratch("ivf_admission_spec")
    val cents = graft.similarity.Similarity.hyperplanes(64, 16, 7L)
    graft.ml.VectorSearch.writeIvfIndex(
      graft.similarity.Similarity.assignFixed(bench, cents),
      "cluster", cents.zipWithIndex.map(_.swap), path)
    // plant a verbatim clone of an indexed vector among the arrivals:
    // it MUST be rejected (cos 1 in its own probed list)
    val clone = bench.limit(1)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().head
    val stream = emb.filter(col("vec_id") % 10 =!= 0)
      .as[(Long, Array[Float])].collect().toSeq
    val in = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.semanticAdmission(
        in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        path, minCos = 0.4, nprobe = 4)
      .writeStream.format("memory").queryName("sem_admit_stream")
      .outputMode("append").start()
    try {
      // two micro-batches at an arbitrary split — stateless operator,
      // so the admitted set must not depend on the split
      val (b1, b2) = (stream :+ clone).splitAt(stream.length / 3)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val got = spark.table("sem_admit_stream").as[Long].collect().toSet
      assert(!got.contains(clone._1), "verbatim clone of an indexed vector must be rejected")
      val batch = EventStreams.semanticAdmission(
          (stream :+ clone).toDF("vec_id", "embedding"), "vec_id", "embedding",
          path, minCos = 0.4, nprobe = 4)
        .as[Long].collect().toSet
      assert(got == batch, "streamed admission must equal the batch replay")
      assert(got.nonEmpty && got.size < stream.length + 1)
    } finally q.stop()
  }

  test("nearDupCandidates pairs a near-duplicate arriving within the skew") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prose = "the quick brown fox jumps over the lazy dog again and again " +
      "while the cat watches from the old wooden fence nearby"
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.nearDupCandidates(
        in.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2024-01-01 00:00:00"), prose),
        (2L, ts("2024-01-01 00:10:00"), prose + " with a tiny suffix change"),
        (3L, ts("2024-01-01 00:20:00"), "completely different text about " +
          "spaceships and planets orbiting a distant star in deep space"),
        // sub-shingle-length docs: degenerate sketches must NOT pair
        (4L, ts("2024-01-01 00:21:00"), "ok"),
        (5L, ts("2024-01-01 00:22:00"), "yes"))
      q.processAllAvailable()
      val got = spark.table("neardup_stream")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 2L)), s"near-dup pair missing: $got")
      assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
        s"unrelated docs must not pair: $got")
      assert(!got.contains((4L, 5L)), s"shingle-less docs must not pair: $got")
    } finally q.stop()
  }

  test("nearDupCandidatesBucketed emits the same pair set as the join form") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .withColumn("ts", expr("timestamp_seconds(1704067200 + doc_id)"))
    def run(nm: String)(
        f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamRunner.runAvailableNow(spark, docs, nm, "append")(f)
        .select("id_a", "id_b", "band").as[(Long, Long, Int)].collect().toSet
    val joined = run("equiv_join") { src =>
      EventStreams.nearDupCandidatesPortable(src, "doc_id", "text", "ts",
        watermark = "30 days", maxSkew = "30 days", n = 3,
        numHashes = 16, bands = 4)
    }
    val bucketed = run("equiv_bucketed") { src =>
      EventStreams.nearDupCandidatesBucketed(src, "doc_id", "text", "ts",
        watermark = "30 days", maxSkew = "30 days", n = 3,
        numHashes = 16, bands = 4)
    }
    assert(joined.nonEmpty, "fixture produced no candidate pairs")
    assert(bucketed === joined)
  }

  test("nearDupCandidatesBucketed enforces the maxSkew bound") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prose = "the quick brown fox jumps over the lazy dog again and again " +
      "while the cat watches from the old wooden fence nearby"
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.nearDupCandidatesBucketed(
        in.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
        watermark = "10 hours", maxSkew = "30 minutes")
      .writeStream.format("memory").queryName("neardup_bucketed")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2024-01-01 00:00:00"), prose),
        (2L, ts("2024-01-01 00:10:00"), prose + " with a tiny suffix change"),
        // same text but far outside the 30-minute skew: no pair
        (3L, ts("2024-01-01 05:00:00"), prose))
      q.processAllAvailable()
      val got = spark.table("neardup_bucketed")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 2L)), s"near-dup pair missing: $got")
      assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
        s"out-of-skew doc must not pair: $got")
    } finally q.stop()
  }

  test("sessionizeWithState closes sessions when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionizeWithState(in.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      // gaps-and-islands WITHIN the batch: both users' event pairs sit
      // ≥ the 60 s gap apart, so each user's FIRST session closes in
      // the fold itself; then the post-batch watermark (max ts 07:30 −
      // 10 s) passes user 1's open tail (01:20 + gap) → its timeout
      // fires too. User 2's tail (07:30 + gap) is still ahead of the
      // watermark and stays open.
      assert(spark.table("state_sessions")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet ===
        Set((1L, 1L, 1.0), (1L, 1L, 2.0), (2L, 1L, 3.0)))
      // jump event time a month ahead → watermark sails past user 2
      in.addData(Event(10, ts("2024-02-01 00:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
      // timeouts fire on the batch AFTER the watermark advance
      in.addData(Event(11, ts("2024-02-01 00:00:01"), 99, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("state_sessions")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(got === Set((1L, 1L, 1.0), (1L, 1L, 2.0),
        (2L, 1L, 3.0), (2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("runAvailableNowOrdered handles an empty input frame (one empty staged file, zero output rows)") {
    import spark.implicits._
    // an empty frame stages a single empty part file — the ordered
    // replay must complete with zero rows, and the stage listing path
    // (now a closed directory stream + a nonEmpty guard) must not
    // throw on the degenerate shape
    val empty = Seq.empty[(Long, Timestamp, String)]
      .toDF("id", "ts", "kind")
    val res = graft.streaming.StreamRunner.runAvailableNowOrdered(spark, empty,
        "ordered_empty", "append", "ts") { src => src.filter(col("id") > 0) }
    assert(res.count() === 0)
  }

  test("sessionizeWithState closeOnType hard-closes at the terminator") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionizeWithState(in.toDS(), gapMs = 60000L,
        closeOnType = Some("purchase"))
      .writeStream.format("memory").queryName("state_sessions_close")
      .outputMode("append").start()
    def got = spark.table("state_sessions_close")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    try {
      // mid-batch: click → purchase (30 s later, inside the 60 s gap)
      // → click. The purchase CLOSES session 1 at itself (2 events,
      // value 3.0) and the trailing click opens a fresh session — no
      // watermark has passed anything, so the emission is the
      // value-dependent close, not a timeout
      in.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:00:10"), 1, "purchase", 2.0),
        Event(3, ts("2024-01-01 00:00:20"), 1, "click", 4.0))
      q.processAllAvailable()
      assert(got === Set((1L, 2L, 3.0)),
        s"purchase must close its session mid-batch: $got")
      // cross-batch: a purchase 30 s after the carried open tail
      // (inside the gap) folds INTO the carried session, closes it,
      // and must leave NO state behind
      in.addData(Event(4, ts("2024-01-01 00:00:50"), 1, "purchase", 8.0))
      q.processAllAvailable()
      assert(got === Set((1L, 2L, 3.0), (1L, 2L, 12.0)),
        s"cross-batch purchase must fold into the carried session: $got")
      // sail the watermark a month past everything: a stale state entry
      // for user 1 would now re-emit via timeout — the close must have
      // removed it
      in.addData(Event(10, ts("2024-02-01 00:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
      in.addData(Event(11, ts("2024-02-01 00:00:01"), 99, "click", 0.0))
      q.processAllAvailable()
      assert(got.count(_._1 == 1L) === 2,
        s"purchase-closed session re-emitted at timeout: $got")
    } finally q.stop()
  }

  test("sessionizeWithState emitEvery emits mid-session partials; the count carries across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionizeWithState(in.toDS(), gapMs = 60000L,
        emitEvery = Some(3))
      .writeStream.format("memory").queryName("state_sessions_partial")
      .outputMode("append").start()
    def got = spark.table("state_sessions_partial")
      .select("user_id", "n_events", "total_value", "is_partial")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    try {
      // two events: below the emit cadence, nothing emits (no gap, no
      // watermark movement past anything)
      in.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:00:10"), 1, "view", 2.0))
      q.processAllAvailable()
      assert(got.isEmpty, s"nothing should emit before the 3rd event: $got")
      // the 3rd event arrives in a LATER batch: the carried count must
      // trigger the partial (running 3 events, 6.0) with the session
      // still open
      in.addData(Event(3, ts("2024-01-01 00:00:20"), 1, "purchase", 3.0))
      q.processAllAvailable()
      assert(got === Set((1L, 3L, 6.0, true)),
        s"3rd event must emit a partial across the batch boundary: $got")
      // one more event, then sail the watermark: the FINAL row carries
      // the full session (4 events) with is_partial=false — the
      // partial did not truncate or close anything
      in.addData(Event(4, ts("2024-01-01 00:00:30"), 1, "click", 4.0))
      q.processAllAvailable()
      in.addData(Event(10, ts("2024-02-01 00:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
      in.addData(Event(11, ts("2024-02-01 00:00:01"), 99, "click", 0.0))
      q.processAllAvailable()
      assert(got.contains((1L, 4L, 10.0, false)) &&
        got.count(_._1 == 1L) === 2,
        s"final must close the whole 4-event session exactly once: $got")
    } finally q.stop()
  }

  test("sessionizeWithState combined closeOnType + emitEvery: an event that is both the n-th and a terminator emits partial THEN final, and leaves no state") {
    // VERDICT r14 item 3: each flag was separately pinned (sw42/sw43)
    // but their interaction — the n-th event of a session is ALSO the
    // terminator — exercised an emission order nothing spec'd. The
    // fold fires the cadence partial first (the event is counted, the
    // session is momentarily open at n events), then the
    // value-dependent close emits the final summary for the SAME
    // n events and removes the state. Both rows carry identical
    // aggregates; only is_partial separates them.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionizeWithState(in.toDS(), gapMs = 60000L,
        closeOnType = Some("purchase"), emitEvery = Some(2))
      .writeStream.format("memory").queryName("state_sessions_combined")
      .outputMode("append").start()
    def gotOrdered = spark.table("state_sessions_combined")
      .select("user_id", "n_events", "total_value", "is_partial")
      .as[(Long, Long, Double, Boolean)].collect().toList
    try {
      // mid-batch: click → purchase. The purchase is event #2 (the
      // cadence point) AND the terminator: emission sequence must be
      // the partial (2 events, 3.0, open) followed by the final
      // (2 events, 3.0, closed) — not final-only, not partial-only,
      // and never final-before-partial
      in.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:00:10"), 1, "purchase", 2.0))
      q.processAllAvailable()
      assert(gotOrdered === List((1L, 2L, 3.0, true), (1L, 2L, 3.0, false)),
        s"n-th terminator must emit partial then final: $gotOrdered")
      // cross-batch: the carried open tail (1 event) meets a
      // terminator that is also its 2nd event in the NEXT batch —
      // same partial-then-final fold across the boundary
      in.addData(Event(3, ts("2024-01-01 00:01:00"), 2, "click", 5.0))
      q.processAllAvailable()
      in.addData(Event(4, ts("2024-01-01 00:01:20"), 2, "purchase", 7.0))
      q.processAllAvailable()
      assert(gotOrdered.drop(2) ===
        List((2L, 2L, 12.0, true), (2L, 2L, 12.0, false)),
        s"cross-batch n-th terminator must fold then split: $gotOrdered")
      // sail the watermark a month past everything: the terminator
      // removed both users' state, so nothing may re-emit at timeout
      in.addData(Event(10, ts("2024-02-01 00:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
      in.addData(Event(11, ts("2024-02-01 00:00:01"), 99, "click", 0.0))
      q.processAllAvailable()
      assert(gotOrdered.count(r => r._1 == 1L || r._1 == 2L) === 4,
        s"terminator-closed sessions re-emitted at timeout: $gotOrdered")
    } finally q.stop()
  }

  test("sessionizeWithState rejects a non-positive emitEvery at construction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    // ADVICE r14: emitEvery = 0 used to survive to `nEvents % n`
    // inside the running fold and kill the query mid-batch with an
    // ArithmeticException; the bad argument must fail where written
    intercept[IllegalArgumentException] {
      EventStreams.sessionizeWithState(in.toDS(), gapMs = 60000L,
        emitEvery = Some(0))
    }
    intercept[IllegalArgumentException] {
      EventStreams.sessionizeWithState(in.toDS(), gapMs = 60000L,
        emitEvery = Some(-3))
    }
  }

  test("emptyReplayResult: the zero-part-file fallback preserves the transform's output schema at zero rows (stateful transform batch-legal)") {
    import spark.implicits._
    // ADVICE r14: the ordered replay's empty-input path relied on the
    // parquet writer staging one schema-preserving empty part file; a
    // writer that stages NOTHING must land here instead of failing
    // the nonEmpty require. The fallback runs the transform over a
    // same-schema empty batch frame — watermark + stateful ops are
    // batch-legal, and zero rows carry no state — so the result has
    // the transform's output schema and zero rows.
    val emptyEvents = Seq.empty[Event].toDS().toDF()
    val res = graft.streaming.StreamRunner.emptyReplayResult(emptyEvents) {
      df => EventStreams.sessionizeWithState(
        df.as[Event], gapMs = 60000L, emitEvery = Some(2)).toDF()
    }
    assert(res.columns.toSeq ==
      Seq("user_id", "n_events", "total_value", "last_ts_us", "is_partial"))
    assert(res.count() === 0)
  }

  test("budgetAdmission carries spent-token state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val q = EventStreams.budgetAdmission(
        in.toDF().toDF("doc_id", "source", "text"),
        "doc_id", "source", "text", budget = 5L)
      .writeStream.format("memory").queryName("budget_admit")
      .outputMode("append").start()
    try {
      // batch 1: srcA spends 2 then 2 (cum 4 ≤ 5); srcB spends 4
      in.addData((1L, "srcA", "a b"), (2L, "srcA", "c d"),
        (10L, "srcB", "w x y z"))
      q.processAllAvailable()
      // batch 2: srcA's next doc crosses the horizon (cum 4+2=6 > 5),
      // srcB's stays inside (4+1=5 ≤ 5) — state must have carried
      in.addData((3L, "srcA", "e f"), (11L, "srcB", "v"))
      q.processAllAvailable()
      val got = spark.table("budget_admit")
        .select("doc_id", "admit").as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 10L -> 1L, 11L -> 1L))
    } finally q.stop()
  }

  test("budgetAdmission orders a micro-batch's docs by doc_id before spending") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val q = EventStreams.budgetAdmission(
        in.toDF().toDF("doc_id", "source", "text"),
        "doc_id", "source", "text", budget = 3L)
      .writeStream.format("memory").queryName("budget_order")
      .outputMode("append").start()
    try {
      // fed in REVERSE id order: the handler must still admit 1,2 and
      // reject 3 (prefix by doc_id, not by arrival position)
      in.addData((3L, "s", "z z"), (1L, "s", "a"), (2L, "s", "b c"))
      q.processAllAvailable()
      val got = spark.table("budget_order")
        .select("doc_id", "admit").as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
    } finally q.stop()
  }

  test("budgetAdmission fails loudly on out-of-order cross-batch arrivals") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val q = EventStreams.budgetAdmission(
        in.toDF().toDF("doc_id", "source", "text"),
        "doc_id", "source", "text", budget = 5L)
      .writeStream.format("memory").queryName("budget_guard")
      .outputMode("append").start()
    try {
      in.addData((5L, "s", "a b"))
      q.processAllAvailable()
      // a LOWER doc_id in a later batch breaks the oracle-equivalence
      // contract: the guard must surface it, never silently diverge
      in.addData((3L, "s", "c"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(t =>
        String.valueOf(t.getMessage).contains("out-of-order")), e.getMessage)
    } finally q.stop()
  }

  test("runUpsertLatest merges micro-batches to one latest row per key") {
    import spark.implicits._
    // 40 rows / 4 versions per key: the 8-file staging split with
    // maxFilesPerTrigger=2 spreads versions across several
    // micro-batches, so the merge must carry state batch to batch
    val rows = for (k <- 1L to 10L; v <- 1L to 4L)
      yield (k, v, s"payload_${k}_$v")
    val df = rows.toDF("key", "version", "payload")
    val got = graft.streaming.StreamRunner.runUpsertLatest(spark, df,
        "spec_upsert", keyCols = Seq("key"), latestByCols = Seq("version"))
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == (1L to 10L))
    got.foreach { case (k, v, p) =>
      assert(v == 4L && p == s"payload_${k}_4", s"key $k kept version $v")
    }
  }

  test("indexDedupAdmission rejects indexed content and cross-batch replays") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = ScratchDirs.scratch("spec_stream_hash_idx")
    graft.dedup.Dedup.writeHashIndex(
      Seq((10L, "indexed doc")).toDF("doc_id", "text"), "doc_id", "text", path)
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = EventStreams.indexDedupAdmission(
        in.toDF().toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", path, watermark = "30 days")
      .writeStream.format("memory").queryName("idx_dedup")
      .outputMode("append").start()
    try {
      in.addData((1L, "fresh one", ts("2024-01-01 00:00:01")),
        (2L, "indexed doc", ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
      // a SECOND micro-batch replaying batch-1 content: the
      // within-stream state must reject it across the batch boundary
      in.addData((3L, "fresh one", ts("2024-01-01 00:00:03")),
        (4L, "another novel", ts("2024-01-01 00:00:04")))
      q.processAllAvailable()
      val got = spark.table("idx_dedup").as[Long].collect().toSet
      assert(got == Set(1L, 4L),
        s"expected index reject (2), cross-batch replay reject (3): $got")
    } finally q.stop()
  }

  test("liveIndexDedupAdmission: tombstoned content re-admits mid-stream, retained rejects") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = ScratchDirs.scratch("spec_stream_live_idx")
    graft.dedup.Dedup.writeHashIndex(
      Seq((10L, "deleted doc"), (11L, "retained doc"))
        .toDF("doc_id", "text"), "doc_id", "text", path)
    graft.dedup.Dedup.tombstoneHashIndex(
      Seq("deleted doc").toDF("text"), "text", path)
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = EventStreams.liveIndexDedupAdmission(
        in.toDF().toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", path, watermark = "30 days")
      .writeStream.format("memory").queryName("live_idx_dedup")
      .outputMode("append").start()
    try {
      in.addData((1L, "deleted doc", ts("2024-01-01 00:00:01")),
        (2L, "retained doc", ts("2024-01-01 00:00:02")),
        (3L, "fresh doc", ts("2024-01-01 00:00:03")))
      q.processAllAvailable()
      val got = spark.table("live_idx_dedup").as[Long].collect().toSet
      assert(got == Set(1L, 3L),
        s"expected tombstoned re-admit (1) + fresh (3), retained reject (2): $got")
    } finally q.stop()
  }

  test("nearDupIndexAdmission drops indexed near-dups across micro-batches; short docs pass") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = ScratchDirs.scratch("spec_stream_mh_idx")
    graft.dedup.Dedup.writeMinhashIndex(Seq(
        (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (11L, "completely different text about spark catalyst optimizer rules and codegen stages"))
      .toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 16, bands = 4, path)
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.nearDupIndexAdmission(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", path,
        n = 3, numHashes = 16, bands = 4, minJaccard = 0.5)
      .writeStream.format("memory").queryName("mh_admission")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact replay of indexed 10 → drop
        (2L, "wholly original sentences mentioning parquet scans and shuffle partitions only"))
      q.processAllAvailable()
      in.addData(
        (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of indexed 10 → drop
        (4L, "too short"), // < 3 tokens: empty signature, matches nothing → admit
        (5L, "genuinely fresh vocabulary in every position of this arriving document stream"))
      q.processAllAvailable()
      val got = spark.table("mh_admission").as[Long].collect().toSet
      assert(got == Set(2L, 4L, 5L),
        s"expected exact (1) and near (3) index rejects, short doc (4) admitted: $got")
    } finally q.stop()
  }

  test("histCells maintained across micro-batches equals the batch-built histogram") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = graft.text.Sketches.histCells(
        in.toDF().toDF("source", "n"), "source", col("n"), width = 10)
      .writeStream.format("memory").queryName("hist_cells")
      .outputMode("complete").start()
    try {
      in.addData(("a", 5L), ("a", 17L), ("b", 3L))
      q.processAllAvailable()
      in.addData(("a", 12L), ("b", 95L), ("a", 7L))
      q.processAllAvailable()
      val streamed = spark.table("hist_cells")
        .select("g", "b", "cnt").as[(String, Long, Long)].collect().toSet
      val batch = graft.text.Sketches.histCells(
          Seq(("a", 5L), ("a", 17L), ("b", 3L), ("a", 12L), ("b", 95L), ("a", 7L))
            .toDF("source", "n"), "source", col("n"), width = 10)
        .select("g", "b", "cnt").as[(String, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"streamed cells diverge from batch: ${streamed diff batch} / ${batch diff streamed}")
      // extraction over the streamed cells matches the one-shot operator
      val fromStream = graft.text.Sketches.histQuantilesFromCells(
          spark.table("hist_cells"), "source", width = 10, qs = Seq(0.5, 0.9))
        .orderBy("source", "q").collect().toSeq
      val oneShot = graft.text.Sketches.histogramQuantiles(
          Seq(("a", 5L), ("a", 17L), ("b", 3L), ("a", 12L), ("b", 95L), ("a", 7L))
            .toDF("source", "n"), "source", col("n"), width = 10,
          qs = Seq(0.5, 0.9))
        .orderBy("source", "q").collect().toSeq
      assert(fromStream == oneShot)
    } finally q.stop()
  }

  test("cmsCells maintained across micro-batches equals the batch-built sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
    val q = graft.text.Sketches.cmsCells(stream, "tok", d = 4, w = 32)
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      // the sketch must accumulate across SEPARATE micro-batches —
      // this is the incremental-maintenance claim sw12's single
      // AvailableNow run can't distinguish from a batch rebuild
      in.addData((1L, "alpha beta alpha"), (2L, "gamma beta"))
      q.processAllAvailable()
      in.addData((3L, "alpha delta delta beta"))
      q.processAllAvailable()
      val streamed = spark.table("cms_cells")
        .select("r", "c", "cell_cnt").as[(Int, Int, Long)].collect().toSet
      val batch = graft.text.Sketches.cmsCells(
          Seq("alpha beta alpha", "gamma beta", "alpha delta delta beta")
            .toDF("text")
            .select(explode(graft.text.TextOps.tokens(col("text"))).as("tok")),
          "tok", d = 4, w = 32)
        .select("r", "c", "cell_cnt").as[(Int, Int, Long)].collect().toSet
      assert(streamed == batch,
        s"streamed cells diverge from batch: ${streamed diff batch} / ${batch diff streamed}")
      // state is the sketch: never more than d·w rows
      assert(streamed.size <= 4 * 32)
    } finally q.stop()
  }
}
