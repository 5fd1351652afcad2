package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming facade over event streams.
  *
  * The reference has no streaming surface (SURVEY §2.12) — this is the
  * engine's phase-E extension: the SAME declarative transforms as the
  * batch pack (q15/q17 use the identical `window()` expression), lifted
  * onto an unbounded source with watermark-bounded state.
  *
  * Scale design: every operator here is keyed (user_id / window), so
  * state partitions across executors; watermarks bound state size —
  * without one, a 100 TB/day stream would accumulate state forever.
  * Sinks: any `DataStreamWriter` — the facade returns DataFrames so the
  * caller picks format/output-mode/trigger.
  */
object EventStreams {

  /** Watermarked tumbling-window counts per event type — streaming twin
    * of q17_tumbling_windows; late rows beyond `watermark` are dropped
    * and their window state reclaimed. */
  def windowedTypeCounts(events: DataFrame, window: String = "6 hours",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Built-in session windows: events of one user belong to the same
    * session while gaps stay under `gap`. */
  def sessionWindowStats(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming purchase attribution — the ingest-time lift of the q20
    * as-of join as a watermarked stream-stream INTERVAL join: every
    * (purchase, click by the same user within `maxLag` BEFORE the
    * purchase) pair. An unbounded as-of would need unbounded join
    * state, so the streaming contract is the bounded-lookback
    * attribution clickstream deployments actually run; "last click
    * wins" is a per-purchase aggregate over the emitted candidates
    * (inner-join rows emit on match — append mode needs no
    * final-watermark flush). State per side is bounded by
    * watermark + `maxLag` and keyed by user — the join's natural
    * shuffle key, so state partitions across executors. */
  def attributionPairs(events: DataFrame, watermark: String,
      maxLag: String): DataFrame = {
    // two independently-derived branches of the same source (the
    // nearDupCandidatesWith pattern): a renamed self-join of ONE
    // streaming plan trips ambiguous-attribute resolution in the
    // streaming join planner
    def side(tpe: String, idName: String, userName: String, tsName: String) =
      events.filter(col("event_type") === tpe)
        .withWatermark("ts", watermark)
        .select(col("event_id").as(idName), col("user_id").as(userName),
          col("ts").as(tsName))
    val p = side("purchase", "purchase_id", "p_user", "p_ts")
    val c = side("click", "click_id", "c_user", "c_ts")
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $maxLag"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"), col("c_ts"))
  }

  /** LEFT-OUTER streaming attribution (sw38) — [[attributionPairs]]
    * with the unattributed purchases KEPT: the engine emits a
    * null-padded row for a purchase once the watermark proves no
    * matching click can still arrive (its join-state eviction point),
    * which is the half of the outer-join contract an inner join never
    * exercises. Purchases younger than the final watermark stay open
    * (no row — their verdict genuinely isn't known yet); the batch
    * oracle replays exactly that boundary. State per side is bounded
    * by watermark + `maxLag` and keyed by user, as in
    * [[attributionPairs]]. */
  def attributionPairsOuter(events: DataFrame, watermark: String,
      maxLag: String): DataFrame = {
    def side(tpe: String, idName: String, userName: String, tsName: String) =
      events.filter(col("event_type") === tpe)
        .withWatermark("ts", watermark)
        .select(col("event_id").as(idName), col("user_id").as(userName),
          col("ts").as(tsName))
    val p = side("purchase", "purchase_id", "p_user", "p_ts")
    val c = side("click", "click_id", "c_user", "c_ts")
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $maxLag"),
        "left_outer")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"), col("c_ts"))
  }

  /** Streaming decontamination probe — the stream-STATIC broadcast
    * join pattern: each arriving document's distinct n-grams probe a
    * static benchmark gram set (built batch-side, broadcast once);
    * emits (id, n_grams) per contaminated document. The stream side
    * never shuffles for the probe itself — flagging happens in the
    * scan-stage micro-batch — and only flagged (id, gram-hit) rows
    * enter the per-id aggregation state. The streaming twin of
    * graft.dedup.Dedup.contaminatedIds: an ingest pipeline drops or
    * quarantines flagged docs before they ever land in the corpus.
    * (Complete-mode aggregate state is one row per FLAGGED doc —
    * contamination-sized; a continuous deployment would swap in a
    * watermarked windowed aggregate to bound it in time as well.) */
  def contaminationCounts(docs: DataFrame, benchGrams: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(graft.dedup.Dedup.shingles(col(textCol), n)).as("ng"))
      .join(broadcast(benchGrams.toDF("ng")), "ng")
      .groupBy("id").agg(count(lit(1)).as("n_grams"))

  /** Streaming quality audit — the ingest-time lift of
    * graft.text.TextOps.gopherRules: the rule flags are pure
    * scan-stage expressions, so they ride an unbounded stream with
    * ZERO state (no watermark, no aggregation — append mode). Emits
    * every document with its per-rule 0/1 verdicts; an ingest
    * deployment filters `pass = 1` into the corpus sink and routes
    * the rest to a quarantine sink from the same stream. */
  def qualityFlags(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], minTokens: Int, maxTokens: Int,
      minMeanLen: Double, maxMeanLen: Double, minStopHits: Int): DataFrame =
    graft.text.TextOps.gopherRules(docs, idCol, textCol, stopwords,
      minTokens, maxTokens, minMeanLen, maxMeanLen, minStopHits)

  /** Streaming exact dedup — the ingest-time twin of
    * graft.dedup.Dedup.dropExactDups for a continuous document feed:
    * keep the FIRST arrival per content hash, drop replays. State is
    * one hash per distinct document, bounded by the watermark: a
    * duplicate arriving later than `watermark` after its original is
    * no longer deduplicated (its state was reclaimed) — the standard
    * streaming-dedup contract. Keyed by the hash, so state partitions
    * across executors. */
  def dedupByContent(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /** Per-row MinHash band hashes as a PURE expression — no groupBy, so
    * it runs scan-stage on an unbounded stream: signature element i =
    * min over shingles of xxhash64(i, shingle); band hash = xxhash64 of
    * its signature rows. Same family as the batch
    * graft.dedup.Dedup.minhashLshPairs. Takes the SHINGLE array column
    * (not the raw text) so callers compute shingles once — shingling is
    * the dominant per-row cost on this hot scan-stage path. */
  private def minhashBandsFromShingles(sh: org.apache.spark.sql.Column,
      numHashes: Int, bands: Int): org.apache.spark.sql.Column = {
    val mins = (0 until numHashes).map(i =>
      array_min(transform(sh, s => xxhash64(lit(i), s))))
    val rows = numHashes / bands
    array((0 until bands).map(b =>
      xxhash64((b * rows until (b + 1) * rows).map(mins): _*)): _*)
  }

  /** Streaming NEAR-dup candidate detection — the banded-MinHash
    * sibling of [[dedupByContent]]: each arriving document's band
    * hashes are computed scan-stage, and a watermarked stream-stream
    * self-join keyed by (band, bandHash) emits candidate pairs whose
    * arrival times lie within `maxSkew` (the join-state retention
    * bound — without it stream-stream join state grows forever).
    * Emits one row per agreeing band (id_a, id_b, band) with id_a <
    * id_b; downstream exact verification (or a batch reconcile) dedups
    * and confirms, exactly as in the batch LSH pipeline. */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "1 hour", maxSkew: String = "1 hour",
      n: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame =
    nearDupCandidatesWith(docs, idCol, textCol, tsCol, watermark, maxSkew,
      bandsOfText = t => {
        // empty-shingles guard: the expression form would otherwise
        // emit one shared constant band array for every < n-token doc
        // (codegen CSE evaluates the shingle kernel once per row)
        val sh = graft.dedup.Dedup.shingles(t, n)
        when(size(sh) === 0, array().cast("array<bigint>"))
          .otherwise(minhashBandsFromShingles(sh, numHashes, bands))
      })

  /** [[nearDupCandidates]] with the PORTABLE MinHash family (one md5
    * per shingle + Kirsch–Mitzenmacher double hashing — the same
    * construction as graft.dedup.Dedup.minhashLshPairsPortable), so the
    * streaming candidate stream is DuckDB-oracle-checkable end to end
    * (sw04). */
  def nearDupCandidatesPortable(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "1 hour", maxSkew: String = "1 hour",
      n: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame =
    nearDupCandidatesWith(docs, idCol, textCol, tsCol, watermark, maxSkew,
      // fused text→bands kernel: no intermediate shingle array — the
      // scan stage runs once per join side, so the saving doubles
      bandsOfText = t => {
        import org.apache.spark.sql.GraftExpressionBridge
        import org.apache.spark.sql.catalyst.expressions.Literal
        GraftExpressionBridge.column(graft.functions.TextKernelExprs
          .minhashBandsText(Seq(GraftExpressionBridge.expression(t),
            Literal(n), Literal(numHashes), Literal(bands))))
      })

  /** Codegen'd StaticInvoke form of the portable band sketch
    * (graft.functions.TextKernels.minhashBandsPortable) — one tight
    * loop per row. The interpreted HOF form it replaced
    * ([[minhashBandsPortableExpr]], kept for the equivalence spec) ran
    * numHashes separate array passes per row and dominated the sw04
    * scan stage (15 s → ~3 s at sf0.1). */
  private[graft] def minhashBandsPortableKernel(sh: org.apache.spark.sql.Column,
      numHashes: Int, bands: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftExpressionBridge.column(graft.functions.TextKernelExprs.minhashBands(
      Seq(GraftExpressionBridge.expression(sh), Literal(numHashes), Literal(bands))))
  }

  /** Pure-expression portable band sketch — the (slower) reference
    * implementation of [[minhashBandsPortableKernel]], equivalence-
    * tested in TextKernelsSpec. The (h1, h2) halves are built inside
    * ONE transform so md5 runs once per shingle even without
    * subexpression elimination across the numHashes mins. */
  private[graft] def minhashBandsPortableExpr(sh: org.apache.spark.sql.Column,
      numHashes: Int, bands: Int): org.apache.spark.sql.Column = {
    val P = 2147483647L
    val hs = transform(sh, s => {
      val hx = md5(s)
      struct(conv(substring(hx, 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(hx, 9, 8), 16, 10).cast("long").as("h2"))
    })
    val mins = (0 until numHashes).map(i => array_min(transform(hs,
      h => (h.getField("h1") + lit(i.toLong) * h.getField("h2")
        + lit(i.toLong * i)) % P)))
    val rows = numHashes / bands
    val bandsArr = array((0 until bands).map(b =>
      md5(concat_ws("|", (b * rows until (b + 1) * rows).map(mins): _*))): _*)
    // empty-input contract must match the kernel form: [] → [] (and
    // null → null), NOT a constant md5('')-derived array — concat_ws
    // skips the null mins, so an unguarded empty input would hash every
    // shingle-less doc into the same band bucket
    when(sh.isNull, lit(null).cast("array<string>"))
      .when(size(sh) === 0, array().cast("array<string>"))
      .otherwise(bandsArr)
  }

  /** Shared body: `bandsOfText` derives the band-hash array straight
    * from the text column — the only per-family difference between
    * the xxhash64 and portable md5 candidate streams. The
    * shingle-less-doc contract moves to the BANDS array: a doc with
    * < n tokens yields an EMPTY band array (both kernels guarantee
    * it), and is dropped before the join — its signature would
    * otherwise degenerate to one shared constant and pair every short
    * doc with every other. */
  private def nearDupCandidatesWith(docs: DataFrame, idCol: String,
      textCol: String, tsCol: String, watermark: String, maxSkew: String,
      bandsOfText: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    // two independently-derived subplans over the same source: a
    // toDF-renamed self-join of ONE streaming plan trips ambiguous
    // attribute resolution inside the streaming join planner
    def banded(idName: String, tsName: String, bandName: String, bhName: String) =
      docs
        .withColumn("__bands", bandsOfText(col(textCol)))
        .filter(size(col("__bands")) > 0)
        .withWatermark(tsCol, watermark)
        .select(col(idCol).as(idName), col(tsCol).as(tsName),
          posexplode(col("__bands")).as(Seq(bandName, bhName)))
    val a = banded("id_a", "ts_a", "band_a", "bh_a")
    val b = banded("id_b", "ts_b", "band_b", "bh_b")
    // id_a < id_b must be a POST-join filter: Spark's streaming join
    // helper parses every '<' in the condition as a potential
    // state-watermark bound and chokes on non-time columns
    a.join(b,
      col("band_a") === col("band_b") && col("bh_a") === col("bh_b") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $maxSkew") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $maxSkew"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("band_a").as("band"))
  }

  /** One banded document row entering the bucketed near-dup state.
    * `bh` is the band hash FOLDED TO A LONG (xxhash64 of the portable
    * md5 band string): the bucket key is shuffled and stored per row,
    * and an 8-byte key beats a 32-char string; a fold collision merely
    * adds a candidate pair (downstream verification drops it), which
    * is within the at-least-once candidate contract. */
  final case class BandedDoc(band: Int, bh: Long, id: Long, ts: Timestamp)

  /** Candidate pair emitted by [[nearDupCandidatesBucketed]]. */
  final case class BandPair(id_a: Long, id_b: Long, band: Int)

  /** Streaming near-dup candidates with state PRE-BUCKETED by band
    * key — the flatMapGroupsWithState form of
    * [[nearDupCandidatesPortable]], same output contract (one
    * (id_a, id_b, band) row per agreeing band, id_a < id_b, arrival
    * times within `maxSkew`; at-least-once across re-delivery, exactly
    * like the join form — downstream dedups/verifies).
    *
    * Why not the stream-stream join: a symmetric join materializes
    * EVERY banded row into BOTH sides' keyed join state (two state
    * stores per side) and runs the band kernel once per side — 2×
    * scan + 4× state writes. Here the banded scan runs ONCE and each
    * (band, bandHash) bucket keeps ONE compact list of (id, micros)
    * entries; new arrivals pair against the bucket's list and append.
    * Measured at sf0.1: 4.1 s (join form) → ~1.5 s. At scale the
    * state is keyed by band hash (uniform by construction), entries
    * are pruned to the `maxSkew` horizon as the bucket's max event
    * time advances, and the whole bucket times out (event-time) once
    * the watermark passes its horizon.
    *
    * The set of emitted pairs is independent of how the stream splits
    * into micro-batches (the pair predicate is symmetric and every
    * pair's later element sees the earlier one in state or in the same
    * batch) — which is what makes it oracle-checkable against the
    * batch banded self-join. */
  def nearDupCandidatesBucketed(docs: DataFrame, idCol: String,
      textCol: String, tsCol: String, watermark: String = "1 hour",
      maxSkew: String = "1 hour", n: Int = 3, numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    import docs.sparkSession.implicits._
    val skewMicros = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(maxSkew))
      require(iv.months == 0, s"maxSkew must not use month units: $maxSkew")
      iv.days * 86400000000L + iv.microseconds
    }
    val bandsOfText = {
      import org.apache.spark.sql.GraftExpressionBridge
      import org.apache.spark.sql.catalyst.expressions.Literal
      GraftExpressionBridge.column(graft.functions.TextKernelExprs
        .minhashBandsText(Seq(GraftExpressionBridge.expression(col(textCol)),
          Literal(n), Literal(numHashes), Literal(bands))))
    }
    val banded = docs
      .withColumn("__bands", bandsOfText)
      .filter(size(col("__bands")) > 0)
      .withWatermark(tsCol, watermark)
      .select(posexplode(col("__bands")).as(Seq("band", "__bh_raw")),
        col(idCol).as("id"), col(tsCol).as("ts"))
      .select(col("band"), xxhash64(col("__bh_raw")).as("bh"),
        col("id"), col("ts"))
      .as[BandedDoc]
    banded
      .groupByKey(r => (r.band, r.bh))
      // state = packed Array[Long] of (id, eventMicros) pairs — the
      // primitive-array encoder serializes in one memcpy-ish write,
      // which matters because bucket count ≈ banded-row count (most
      // buckets hold one doc)
      .flatMapGroupsWithState[Array[Long], BandPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), rows, state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // (id, eventMicros), sorted for deterministic emission order
            val fresh = rows.map(r =>
              (r.id, r.ts.getTime * 1000L + r.ts.getNanos / 1000L % 1000L))
              .toArray.sortInPlaceBy(identity)
            val prev = state.getOption.getOrElse(Array.emptyLongArray)
            val out = scala.collection.mutable.ArrayBuffer.empty[BandPair]
            val known = scala.collection.mutable.ArrayBuffer.empty[Long]
            known ++= prev
            fresh.foreach { case (id, ts) =>
              var i = 0
              while (i < known.length) {
                val pid = known(i); val pts = known(i + 1)
                if (pid != id && math.abs(ts - pts) <= skewMicros)
                  out += BandPair(math.min(id, pid), math.max(id, pid), band)
                i += 2
              }
              known += id; known += ts
            }
            // prune against the WATERMARK, not the bucket's max event
            // time: an entry is dead only once its ts < watermark - skew
            // (no future non-late arrival can still pair with it). The
            // old maxTs-based prune could drop an entry that an
            // out-of-order-but-on-time doc within maxSkew would pair
            // with, breaking micro-batch-split invariance. maxTs is
            // still computed for the state-timeout bound below.
            var maxTs = Long.MinValue
            var i = 1
            while (i < known.length) { maxTs = math.max(maxTs, known(i)); i += 2 }
            val horizon = state.getCurrentWatermarkMs() * 1000L - skewMicros
            val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
            i = 0
            while (i < known.length) {
              if (known(i + 1) >= horizon) {
                kept += known(i); kept += known(i + 1)
              }
              i += 2
            }
            state.update(kept.toArray)
            // bucket state is dead once the watermark passes maxTs+skew
            state.setTimeoutTimestamp(
              math.max(maxTs / 1000L + skewMicros / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
      .toDF()
  }

  /** One document offered for budget admission. */
  final case class BudgetDoc(doc_id: Long, source: String, n_tokens: Long)

  /** Per-document admission verdict under a source token budget. */
  final case class BudgetVerdict(doc_id: Long, source: String,
      n_tokens: Long, admit: Long)

  /** Streaming token-budget ADMISSION — the ingest-time twin of the
    * p14 budget family, in the family's documented NAIVE-PREFIX form
    * (the form p14's own oracle runs): each source admits documents
    * while its cumulative token total INCLUDING the current document
    * stays ≤ `budget` — an arrival-order prefix cut at the budget
    * horizon, exactly a per-source running sum. State per source is
    * ONE long (cumulative tokens seen), keyed by source, so state
    * size is source-cardinality-bounded and needs no watermark
    * (NoTimeout): the production corpus-gating shape, where sources
    * are few and budgets are absolute.
    *
    * Determinism contract: within a micro-batch each source's rows
    * are processed in doc_id order (sorted in the group handler);
    * across batches, the prefix follows arrival order — under the
    * harness's AvailableNow single-staging (and any doc_id-ordered
    * feed) the verdicts equal the batch running-sum oracle (sw10).
    * The contract is ENFORCED (ADVICE r8): state carries the highest
    * doc_id already spent per source, and a later batch delivering a
    * lower (or repeated) doc_id fails loudly instead of silently
    * diverging from the oracle. */
  def budgetAdmission(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, budget: Long): Dataset[BudgetVerdict] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        graft.text.TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .as[BudgetDoc]
      .groupByKey(_.source)
      // state = (cumulative tokens spent, max doc_id processed)
      .flatMapGroupsWithState[(Long, Long), BudgetVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (src, rows, state: GroupState[(Long, Long)]) =>
          var (cum, maxId) = state.getOption.getOrElse((0L, Long.MinValue))
          val batch = rows.toArray.sortInPlaceBy(_.doc_id)
          if (batch.nonEmpty && batch.head.doc_id <= maxId)
            throw new IllegalStateException(
              s"budgetAdmission: out-of-order arrival for source '$src' — " +
                s"doc_id ${batch.head.doc_id} after $maxId already spent " +
                "tokens; feed batches in doc_id order (the documented " +
                "determinism contract)")
          val verdicts = batch.map { d =>
            cum += d.n_tokens
            maxId = d.doc_id
            BudgetVerdict(d.doc_id, d.source, d.n_tokens,
              if (cum <= budget) 1L else 0L)
          }
          state.update((cum, maxId))
          verdicts.iterator
      }
  }

  /** Streaming SEMANTIC admission against a PERSISTED IVF index (sw11)
    * — the embedding-level ingest gate, d18's streaming twin: each
    * arriving document's embedding probes its `nprobe` nearest lists
    * of the index at `indexPath` (graft.ml.VectorSearch.writeIvfIndex
    * layout — the s16 artifact) and is ADMITTED iff no indexed
    * neighbor in those lists reaches cosine `minCos`. Probe-set
    * computation is a pure scan-stage expression
    * (Similarity.probeClusters — no window, streaming-legal); the
    * admission itself is ONE stream-static LEFT-ANTI join, so the
    * whole operator is STATELESS (append mode, no watermark): verdicts
    * emit on arrival and state never grows.
    *
    * Scale shape: the decontamination index is benchmark-sized by
    * nature (an eval suite), so the static side broadcasts — the same
    * posture as batch d18's broadcast benchmark. IVF pruning lives in
    * the join predicate (candidates are checked only against lists in
    * the row's probe set); a corpus-sized index would instead explode
    * probes into a cluster EQUI-join against the list-partitioned
    * layout and aggregate verdicts per doc — the mechanics s18/s19
    * already pin on the batch side. Exact-cosine verification uses the
    * index's precomputed norms (cn) and the arrival's own (qn) — flags
    * are never estimate-only. Output: admitted (id) rows. */
  def semanticAdmission(docs: DataFrame, idCol: String, vecCol: String,
      indexPath: String, minCos: Double, nprobe: Int): DataFrame = {
    import graft.similarity.Similarity
    import graft.functions.FloatVector.dotF
    val spark = docs.sparkSession
    val cents = graft.ml.VectorSearch.readIvfIndexCentroids(spark, indexPath)
    val assigned = spark.read.parquet(s"$indexPath/assignments")
      .select(col("neighbor_id"), col("cv"), col("cn"), col("cluster"))
    docs.select(col(idCol).as("id"), col(vecCol).as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
      .withColumn("probes",
        Similarity.probeClusters(col("qv"), cents.map(_._2), nprobe))
      .join(assigned,
        array_contains(col("probes"), col("cluster")) &&
          round(Similarity.safeCos(dotF(col("qv"), col("cv")),
            col("qn"), col("cn")), 6) >= minCos,
        "left_anti")
      .select("id")
  }

  /** Streaming EXACT-dedup admission against the PERSISTED
    * content-hash index (graft.dedup.Dedup.writeHashIndex — d26's
    * streaming twin, the exact-content sibling of
    * [[semanticAdmission]]): arriving docs are deduped WITHIN the
    * stream on their md5 content hash (dropDuplicatesWithinWatermark —
    * state ∝ distinct content inside the watermark, then expired) and
    * anti-joined against the static index (stateless stream-static
    * left-anti, the sw11 mechanics). Indexed corpus text is never
    * rescanned at ingest. Output: admitted (id) rows. */
  /** DSIR importance-admission gate (sw22): score every incoming doc
    * against the FROZEN bucket-LM artifact (Sampling.writeDsirLm) and
    * admit docs more target-like than raw (rounded score > minScore).
    * The whole gate is one constant-folded scan expression
    * (Sampling.dsirScore) — stateless, no join, no watermark, no
    * state store — so it drops into an append-mode stream unchanged
    * and costs one codegen'd pass per row at any scale. */
  def dsirAdmission(docs: DataFrame, idCol: String, textCol: String,
      lut: Array[Double], nBuckets: Int, minScore: Double): DataFrame =
    docs
      .withColumn("score",
        round(graft.text.Sampling.dsirScore(lut, nBuckets, col(textCol)), 6))
      .filter(col("score") > minScore)
      .select(col(idCol).cast("long").as("id"), col("score"))

  def indexDedupAdmission(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, indexPath: String, watermark: String): DataFrame = {
    val idx = graft.dedup.Dedup
      .readHashIndex(docs.sparkSession, indexPath).select("text_hash")
    docs.withWatermark(tsCol, watermark)
      .withColumn("text_hash", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("text_hash")
      .join(idx, Seq("text_hash"), "left_anti")
      .select(col(idCol).as("id"))
  }

  /** [[indexDedupAdmission]] against the LIVE index — tombstones
    * (Dedup.tombstoneHashIndex, the opt-out/takedown path) honored at
    * serve time without rewriting the index files: the static side is
    * the index anti-joined with its delete side-table, so a
    * re-submission of deleted content is ADMITTED mid-stream while
    * retained content keeps rejecting. Same stream-static shape (the
    * stream side never shuffles onto the index); compaction
    * (Dedup.compactHashIndex) is transparent to this serve — the sw20
    * gate runs one feed before and one after and pins both admissions
    * equal. */
  def liveIndexDedupAdmission(docs: DataFrame, idCol: String,
      textCol: String, tsCol: String, indexPath: String,
      watermark: String): DataFrame = {
    val idx = graft.dedup.Dedup
      .liveHashIndex(docs.sparkSession, indexPath).select("text_hash")
    docs.withWatermark(tsCol, watermark)
      .withColumn("text_hash", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("text_hash")
      .join(idx, Seq("text_hash"), "left_anti")
      .select(col(idCol).as("id"))
  }

  /** Streaming exact-dedup admission through the persisted BLOOM gate
    * (graft.dedup.Dedup.writeBloomIndex — d29's streaming twin, the
    * culled form of [[indexDedupAdmission]]): arriving docs dedup
    * within the stream on their content hash, then ROUTE on the
    * scan-stage BloomFilterMightContain gate — gate=false rows are
    * admitted without touching the index (bloom filters have no false
    * negatives), gate=true rows (true dups + ~fpp of the fresh) verify
    * via the stateless stream-static anti-join. Admitted set ≡
    * [[indexDedupAdmission]]'s exactly; at 100 TB ingest on a
    * mostly-fresh feed the per-batch join input shrinks to the ~fpp
    * sliver, which is the difference between a corpus-sized join per
    * micro-batch and a bit-array probe per row. */
  def bloomIndexAdmission(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, indexPath: String, watermark: String): DataFrame = {
    val spark = docs.sparkSession
    val bytes = graft.dedup.Dedup.readBloomBytes(spark, indexPath)
    val idx = graft.dedup.Dedup
      .readHashIndex(spark, indexPath).select("text_hash")
    val gate = graft.dedup.Dedup.bloomMightContain(bytes, col("text_hash"))
    val hashed = docs.withWatermark(tsCol, watermark)
      .withColumn("text_hash", md5(col(textCol)))
    // Route BEFORE the within-stream dedup: the gate is a pure function
    // of the content hash, so the branches partition the hash space and
    // per-branch dropDuplicatesWithinWatermark ≡ the global one — each
    // branch's state store holds only its own sliver (the verify
    // branch's state is ~fpp of the feed on mostly-fresh ingest).
    hashed.filter(!gate)
      .dropDuplicatesWithinWatermark("text_hash")
      .select(col(idCol).as("id"))
      .unionByName(hashed.filter(gate)
        .dropDuplicatesWithinWatermark("text_hash")
        .join(idx, Seq("text_hash"), "left_anti")
        .select(col(idCol).as("id")))
  }

  /** Streaming NEAR-dup admission against the PERSISTED MinHash band
    * index (graft.dedup.Dedup.writeMinhashIndex — d27's streaming
    * twin, completing the admission-gate family: sw13 exact content,
    * sw11 semantic embedding, and this one lexical near-dup). Each
    * arriving doc computes its portable MinHash SIGNATURE scan-stage
    * (one fused kernel pass per row — the sw04 family) plus its band
    * hashes (md5 over signature slices, the oracle construction), and
    * is ADMITTED iff no indexed doc shares a band hash AND agrees on
    * ≥ minJaccard of the signature. Stateless stream-static anti-join
    * chain — append mode, no state, no watermark; verdicts emit on
    * arrival.
    *
    * Scale shape: "any of `bands` band hashes collides" is an OR of
    * equi predicates, which a SINGLE anti-join can only execute as a
    * nested loop — measured quadratic (stream × index condition
    * evals; the 30× probe DNF'd on it). The admission therefore runs
    * as `bands` CHAINED broadcast-HASH anti-joins, one per band
    * position: each keys on that band's hash (the equi component)
    * with the signature-agreement test as the residual condition,
    * evaluated only on bucket collisions. Semantically identical — a
    * doc survives the chain iff NO band yields a qualifying indexed
    * neighbor — and each hop is stateless and linear in the stream.
    * The static side (signatures + that band's hash, scan-stage) is
    * broadcastable for any recent-window/benchmark-sized index; a
    * truly corpus-sized index shards the same equi key as a shuffled
    * hash join. Docs too short to sign have an empty signature,
    * match nothing, and are admitted — the d27 contract. Output:
    * admitted (id) rows. */
  def nearDupIndexAdmission(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, n: Int, numHashes: Int, bands: Int,
      minJaccard: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rows = numHashes / bands
    def sigExpr(t: org.apache.spark.sql.Column) = {
      import org.apache.spark.sql.GraftExpressionBridge
      import org.apache.spark.sql.catalyst.expressions.Literal
      GraftExpressionBridge.column(graft.functions.TextKernelExprs
        .minhashSigText(Seq(GraftExpressionBridge.expression(t),
          Literal(n), Literal(numHashes))))
    }
    def bandHash(mh: Int => org.apache.spark.sql.Column, b: Int) =
      md5(concat_ws("|", (b * rows until (b + 1) * rows).map(mh): _*))
    val sigs = graft.dedup.Dedup
      .readMinhashSignatures(docs.sparkSession, indexPath)
    // stream side: signature kernel once per row; per-band hashes from
    // it. `get` (0-based, null on out-of-bounds) instead of ANSI
    // element_at: a shingle-less doc's empty signature must compare
    // as null (→ no bucket hit → admitted), not throw.
    var cur = docs
      .withColumn("__sig", sigExpr(col(textCol)))
      .withColumn("__bhs", when(size(col("__sig")) === 0,
          array().cast("array<string>"))
        .otherwise(array((0 until bands).map(b =>
          bandHash(i => get(col("__sig"), lit(i)), b)): _*)))
    for (b <- 0 until bands) {
      val st = sigs.select((0 until numHashes)
          .map(i => col(s"mh_$i").as(s"__m$i")) :+
        bandHash(i => col(s"mh_$i"), b).as("__sbh"): _*)
      val agree = (0 until numHashes)
        .map(i => when(get(col("__sig"), lit(i)) === col(s"__m$i"), 1)
          .otherwise(0))
        .reduce(_ + _)
      cur = cur.join(broadcast(st),
        get(col("__bhs"), lit(b)) === col("__sbh") &&
          round(agree.cast("double") / numHashes, 6) >= minJaccard,
        "left_anti")
    }
    cur.select(col(idCol).as("id"))
  }

  /** Streaming ADMISSION against the persisted SimHash index (sw29 —
    * d35's executed-streaming twin): each arriving row computes its
    * four band longs via the fused per-row kernel (no stream-side
    * aggregation), then four chained stream-static LEFT ANTI
    * broadcast joins drop it when any index sketch shares band b AND
    * verifies at total hamming ≤ `maxHamming`. Token-less rows sign
    * an empty array — `get` yields null, no band ever matches, they
    * admit (the batch simhashAdmit contract). */
  def simhashIndexAdmission(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.GraftExpressionBridge
    val bandsExpr = GraftExpressionBridge.column(
      graft.functions.TextKernelExprs.simhashBandsText(
        Seq(GraftExpressionBridge.expression(col(textCol)))))
    val idx = docs.sparkSession.read.parquet(indexPath)
      .select((0 until 4).map(i => col(s"band$i").as(s"__i$i")): _*)
    var cur = docs.withColumn("__sb", bandsExpr)
    val ham = (0 until 4)
      .map(i => bit_count(get(col("__sb"), lit(i)).bitwiseXOR(col(s"__i$i"))))
      .reduce(_ + _)
    for (b <- 0 until 4) {
      cur = cur.join(broadcast(idx),
        get(col("__sb"), lit(b)) === col(s"__i$b") && ham <= maxHamming,
        "left_anti")
    }
    cur.select(col(idCol).as("id"))
  }

  /** Streaming perceptual-hash ADMISSION against a frozen aHash index
    * (sw36 — the mm06 gate in ingest position, completing the media
    * family's batch/stream twin pair like d35→sw29 did for SimHash):
    * each arriving media row fingerprints via the same mapPartitions
    * aHash kernel the batch index was built with (bit-identical
    * integer arithmetic), then `bands` stream-static LEFT-ANTI joins
    * drop any row some indexed fingerprint matches at Hamming ≤
    * `maxHamming` on a shared bit-band. Undecodable payloads (null
    * hash) are REJECTED — unverifiable content never passes a dedup
    * gate. Anti-joins instead of the batch half's join+distinct:
    * append-mode streams can't aggregate mid-gate, and the per-band
    * anti-join chain is the same candidate set DeMorgan'd. The index
    * side is artifact-sized and broadcasts; at 100 TB it's bucketed
    * by (band, bits) and each probe touches one bucket per band. */
  def phashIndexAdmission(media: DataFrame, idCol: String,
      contentCol: String, indexPath: String, totalBits: Int, bands: Int,
      maxHamming: Int, gw: Int = 8, gh: Int = 4): DataFrame = {
    require(totalBits % bands == 0 && gw * gh == totalBits)
    val rows = totalBits / bands
    val mask = (1L << rows) - 1
    val idx = media.sparkSession.read.parquet(indexPath)
      .select(col("id").as("__ii"), col("ahash").as("__ih"))
    var cur = graft.multimodal.Multimodal
      .avgHash(media, idCol, contentCol, gw, gh)
      .filter(col("ahash").isNotNull)
    for (b <- 0 until bands) {
      val idxB = idx.select(col("__ih"),
        shiftrightunsigned(col("__ih"), b * rows).bitwiseAND(mask)
          .as(s"__ibh$b"))
      cur = cur.join(broadcast(idxB),
        shiftrightunsigned(col("ahash"), b * rows).bitwiseAND(mask)
          === col(s"__ibh$b") &&
          bit_count(col("ahash").bitwiseXOR(col("__ih"))) <= maxHamming,
        "left_anti")
    }
    cur.select(col("media_id").as("id"))
  }

  /** POINT-IN-TIME stream enrichment (sw32/sw35): each arriving label
    * row picks its as-of feature version from its entity's compacted
    * day-sorted history array — one stream-static equi-join on the
    * entity key plus a scan-stage array lookup (`filter` +
    * `element_at(-1)`), no stream-side state. Rows whose entity has
    * no as-of entry drop (a feature vector of "nothing yet" is not a
    * training row). The matched struct lands as column `__m`; the
    * caller projects its fields.
    *
    * The static side is the ONLINE STORE — entity-count-sized, not
    * corpus-sized — and `broadcastMaxEntities` gates the join
    * strategy: at or below it the store broadcasts (zero stream-side
    * shuffle, right while the store fits executor memory); above it
    * the join falls back to a KEYED SHUFFLE, because broadcast size
    * grows linearly with entity count and a hardcoded broadcast hint
    * OOMs executors at 100 TB entity cardinality. `entityCount` is
    * the store's row count — its metadata in a production deployment,
    * one artifact-sized count here. Both plans are PlanSpec-pinned
    * and serve the same oracle (sw32 broadcast, sw35 shuffle). */
  def pitEnrich(src: DataFrame, hist: DataFrame, keyCol: String,
      histCol: String, tsField: String,
      asof: org.apache.spark.sql.Column, entityCount: Long,
      broadcastMaxEntities: Long = 10000000L): DataFrame = {
    // above the gate, pin the keyed shuffle explicitly: the planner's
    // own size estimate could still auto-broadcast a store whose
    // in-memory footprint its stats undercount
    val store =
      if (entityCount <= broadcastMaxEntities) broadcast(hist)
      else hist.hint("merge")
    src.join(store, Seq(keyCol))
      .withColumn("__f", filter(col(histCol), h => h(tsField) <= asof))
      .withColumn("__m", when(size(col("__f")) > 0,
        element_at(col("__f"), -1)))
      .filter(col("__m").isNotNull)
      .drop("__f", histCol)
  }

  /** One event on the wire (micros-precision event time `ts`). */
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Accumulating per-user session state (custom-state showcase).
    * `lastTsUs` is event-time MICROS — the input's full precision;
    * millisecond truncation would let a gap that straddles an exact
    * boundary split differently here than in a µs-precision oracle. */
  final case class SessionState(nEvents: Long, totalValue: Double,
      lastTsUs: Long)

  /** Closed-session summary (`last_ts_us` = last event time, µs).
    * `is_partial` marks a MID-SESSION progress emission (sw43's
    * emitEvery) — the session is still open and will also emit its
    * final row; a closed session always emits with is_partial=false. */
  final case class SessionSummary(user_id: Long, n_events: Long,
      total_value: Double, last_ts_us: Long, is_partial: Boolean = false)

  private def epochUs(ts: Timestamp): Long =
    (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * hand-rolled form of sessionWindowStats for when session semantics
    * outgrow the built-in (value-dependent gaps, mid-session
    * emission). Gaps-and-islands semantics, batch-split invariant for
    * time-ordered arrival: the batch's rows fold in event-time order
    * and a session CLOSES (emits) the moment a gap ≥ `gapMs` appears —
    * within one micro-batch or across them — so the output equals the
    * batch gaps-and-islands aggregation (the q32/sw03 oracle family,
    * gated executed as sw41). The open TAIL session stays in state and
    * closes via EVENT-TIME timeout when the watermark passes its last
    * event + `gapMs` (replayable and deterministic, where a
    * processing-time timeout would depend on the wall clock). State is
    * one small case class per active user.
    *
    * `closeOnType` is the VALUE-DEPENDENT close the built-in session
    * window genuinely cannot express (gated as sw42): an event of
    * that type terminates its session AT that event — the terminator
    * belongs to the session, the summary emits immediately
    * (mid-batch, no timeout wait), and the user's next event starts a
    * fresh session no matter how small the gap. The built-in's
    * dynamic-gap form (`session_window(ts, gapExpr)`) can shrink a
    * gap, but a gap ≤ 0 DROPS the row from sessionization entirely
    * (FilterExec on `session_window.end > session_window.start`), so
    * "terminator counted, then hard split" has no session_window
    * encoding — it needs exactly this state machine.
    *
    * `emitEvery` is MID-SESSION emission, the second semantics out of
    * the built-in's reach (gated as sw43): every n-th event of an
    * open session emits a PROGRESS row (is_partial=true, the running
    * count/total/last-ts at that event) while the session stays open
    * and still emits its final row later. The built-in session window
    * emits exactly one row per session at close — a live dashboard of
    * long-running sessions has no session_window encoding. The count
    * carries in state, so the n-th event fires its partial in
    * whichever micro-batch it arrives — batch-split invariant like
    * the close semantics. */
  def sessionizeWithState(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "10 seconds",
      closeOnType: Option[String] = None,
      emitEvery: Option[Int] = None): Dataset[SessionSummary] = {
    // fail at CONSTRUCTION, not inside the fold: emitEvery = 0 (or
    // negative) would reach `nEvents % n` mid-batch and kill the
    // running streaming query with an ArithmeticException instead of
    // surfacing the bad argument where it was written (ADVICE r14)
    require(emitEvery.forall(_ > 0),
      s"emitEvery must be positive, got $emitEvery")
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionSummary(userId, s.nEvents, s.totalValue, s.lastTsUs))
          } else {
            val sorted = rows.toVector.sortBy(e => (epochUs(e.ts), e.event_id))
            var closed = Vector.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = epochUs(e.ts)
              cur = cur match {
                case Some(s) if t - s.lastTsUs >= gapUs =>
                  closed :+= SessionSummary(userId, s.nEvents, s.totalValue,
                    s.lastTsUs)
                  Some(SessionState(1L, e.value, t))
                case Some(s) =>
                  Some(SessionState(s.nEvents + 1, s.totalValue + e.value,
                    math.max(s.lastTsUs, t)))
                case None => Some(SessionState(1L, e.value, t))
              }
              // mid-session progress emission at every n-th event —
              // the session stays open (its final row still comes)
              if (emitEvery.exists(n => cur.get.nEvents % n == 0)) {
                val s = cur.get
                closed :+= SessionSummary(userId, s.nEvents, s.totalValue,
                  s.lastTsUs, is_partial = true)
              }
              // value-dependent hard close: the terminator is already
              // folded in; emit NOW and leave no open session behind
              if (closeOnType.contains(e.event_type)) {
                val s = cur.get
                closed :+= SessionSummary(userId, s.nEvents, s.totalValue,
                  s.lastTsUs)
                cur = None
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // ceil to ms: the timeout must not fire a µs-hair EARLY
                // (the fold's µs comparison is the split authority)
                state.setTimeoutTimestamp((s.lastTsUs + gapUs) / 1000L + 1L)
              case None =>
                // a terminator ended the batch: carried-over state (if
                // any) was folded into the emitted session — drop it,
                // or the stale open session would re-emit at timeout
                if (state.exists) state.remove()
            }
            closed.iterator
          }
      }
  }

  /** File-source entry point: tail a directory of parquet event files
    * as an unbounded stream (schema pinned from one batch read —
    * streaming sources require an explicit schema). */
  def fileSource(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
  }
}
