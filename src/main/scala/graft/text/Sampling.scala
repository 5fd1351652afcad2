package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mix operators for training pipelines.
  *
  * Random sampling (`df.sample`, `sampleBy`) is irreproducible across
  * engines and re-runs; training splits must be CONTENT-keyed so the
  * same document always lands in the same bucket no matter the engine,
  * partitioning, or run. These operators derive buckets from a content
  * hash — pure expressions, zero shuffle, scan-stage cost at 100 TB.
  */
object Sampling {

  /** Stable bucket in [0, nBuckets) from the first 32 bits of
    * md5(key) — engine-portable (md5 + hex-string parse exist
    * everywhere; the DuckDB oracle uses `CAST('0x'||substr(md5(k),1,8)
    * AS BIGINT)`). Uniform to within 1 part in 2³²/nBuckets (2³² mod
    * nBuckets residue — ~2·10⁻¹⁰ per bucket at nBuckets=10), so the
    * splitLabel defaults really are 70/10/20. For Spark-only pipelines
    * `xxhash64(key) pmod nBuckets` is cheaper but not oracle-portable. */
  def hashBucket(key: Column, nBuckets: Int): Column =
    (conv(substring(md5(key), 1, 8), 16, 10).cast("long") % nBuckets).cast("int")

  /** Deterministic train/val/test assignment by content hash. */
  def splitLabel(key: Column, nBuckets: Int = 10,
      trainUpto: Int = 7, valUpto: Int = 8): Column = {
    val b = hashBucket(key, nBuckets)
    when(b < trainUpto, lit("train"))
      .when(b < valUpto, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic stratified (per-group rate) downsampling — the
    * data-mix primitive for rebalancing an overrepresented stratum
    * ("keep 25% of English, all of the rest"). A row survives iff its
    * content-hash bucket (of `nBuckets`) falls below its stratum's
    * fraction — reproducible across engines/runs/partitionings, unlike
    * `df.stat.sampleBy` (RNG). Scan-stage filter, zero shuffle; exact
    * per-document determinism, fraction resolution 1/nBuckets. */
  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
      fractions: Map[String, Double], default: Double = 1.0,
      nBuckets: Int = 10000): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(key, nBuckets) < frac * nBuckets)
  }

  /** Temperature-smoothed mixture rebalance (α = 0.5): per-stratum
    * keep-rate q_s = min(1, √(n_min/n_s)) downsamples large strata
    * toward the α-smoothed mixture (the standard LLM-corpus move for
    * flattening a source/language imbalance without discarding small
    * strata). Rows are kept by content hash — reproducible across
    * engines/runs like every sampler here.
    *
    * Determinism across engines is engineered, not assumed: n_min and
    * n_s are exact integers, and `sqrt` + division are CORRECTLY
    * ROUNDED IEEE ops (unlike `pow`, whose last ulp is
    * implementation-defined — that is why α is fixed at 0.5 instead
    * of a parameter), so q_s is bit-identical everywhere; the rate is
    * then rounded to 6 dp and floored to an integer bucket threshold,
    * making the keep decision an exact integer compare.
    *
    * Scale shape: one tiny per-stratum count aggregate, its min
    * broadcast back, and a scan-stage hash filter — the corpus never
    * shuffles. */
  def temperatureMix(df: DataFrame, strataCol: String, key: Column,
      nBuckets: Int = 1000000): DataFrame = {
    // null strata: excluded from the mixture computation AND kept
    // whole (q = 1) — matching stratifiedSample, where a null stratum
    // falls through to the default rate. Without the isNotNull guard a
    // tiny unattributed group could become n_min and deflate every
    // real stratum's keep-rate; without the null-keeps-row filter
    // below, the inner equi-join would silently DROP unattributed rows.
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val thresholds = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__nmin"))))
      .withColumn("__q", least(lit(1.0), sqrt(col("__nmin") / col("__n"))))
      .withColumn("__thr", floor(round(col("__q"), 6) * nBuckets).cast("long"))
      .select(col(strataCol), col("__thr"))
    df.join(broadcast(thresholds), Seq(strataCol), "left")
      .filter(col("__thr").isNull || hashBucket(key, nBuckets) < col("__thr"))
      .drop("__thr")
  }

  /** TARGET-SHARE mixture construction — the step past
    * [[temperatureMix]]: a curation spec ships desired TOKEN shares
    * per source plus a total token budget (the data-mix contract a
    * DoReMi-style optimization or a product decision produces), and
    * the engine realizes it: per-source keep-rate
    * r_s = min(1, share_s·budget / tokens_s), rows kept by
    * deterministic content hash. Sources absent from the spec drop
    * entirely; a source smaller than its allocation keeps everything
    * (rate capped at 1 — the realized mixture under-fills that share,
    * visible in the output).
    *
    * Determinism (temperatureMix's recipe): per-source target tokens
    * are computed as EXACT integers driver-side (budget·pct/100);
    * tokens_s is an exact integer sum; r_s is ONE correctly-rounded
    * IEEE long/long division, rounded to 6 dp and floored to an
    * integer bucket threshold — the keep decision is an exact integer
    * compare in any engine. Scale shape: one per-source token
    * aggregate, a spec-sized broadcast join, a scan-stage hash
    * filter — the corpus never shuffles. */
  def targetMix(df: DataFrame, strataCol: String, tokens: Column,
      key: Column, targetSharePct: Map[String, Int], budgetTokens: Long,
      nBuckets: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val targets = targetSharePct.toSeq
      .map { case (s, pct) => (s, budgetTokens * pct / 100) }
      .toDF(strataCol, "__t")
    val counts = df.groupBy(col(strataCol))
      .agg(sum(tokens).as("__n"))
    val thresholds = counts.join(targets, strataCol)
      .withColumn("__q", least(lit(1.0), col("__t") / col("__n")))
      .withColumn("__thr", floor(round(col("__q"), 6) * nBuckets).cast("long"))
      .select(col(strataCol), col("__thr"))
    df.join(broadcast(thresholds), Seq(strataCol), "left")
      .filter(col("__thr").isNotNull && hashBucket(key, nBuckets) < col("__thr"))
      .drop("__thr")
  }

  /** Deterministic global shuffle + shard assignment — the training-
    * data EXPORT primitive: a corpus must be written as N shards in a
    * reproducible pseudo-random order (so every epoch/re-run/engine
    * sees the same byte stream), without a global orderBy, which would
    * serialize 100 TB through a single total-order sort.
    *
    * shard = md5-bucket of (salt, id)  — embarrassingly parallel;
    * pos   = rank of the full md5 hex WITHIN the shard (keyed window:
    *         each shard sorts ~corpus/nShards rows independently).
    *
    * Different `salt` values give independent permutations (epoch
    * reshuffles). Engine-portable: md5-hex everywhere, same contract
    * as [[hashBucket]]. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = concat_ws("|", lit(salt), col(idCol).cast("string"))
    df.withColumn("__hx", md5(salted))
      .withColumn("shard",
        (conv(substring(col("__hx"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__hx"), col(idCol))))
      .drop("__hx")
  }

  /** Weighted upsampling: emit `weightCol` copies of each row
    * (1-indexed `copy_no`) — the data-mix construction primitive
    * ("3 epochs of wiki, 1 of crawl"). A generator, not a join: cost
    * is proportional to output rows only. Weights < 1 emit NOTHING —
    * guarded explicitly, because Spark's `sequence(1, 0)` counts DOWN
    * ([1, 0]) instead of returning empty. */
  /** Exact-k deterministic sample per stratum: the k rows with the
    * smallest md5(key) in each group — the fixed-budget sibling of
    * [[stratifiedSample]]'s rate-based keep (eval sets, per-source
    * inspection samples, few-shot pools all want "exactly k per
    * group", not a fraction). Hash-ordered, so the sample is
    * reproducible across engines, runs, AND corpus growth: a row
    * already sampled stays sampled until k better-hashed rows arrive
    * (bottom-k sketches' stability property, applied to rows).
    *
    * Scale shape: the map-side-combining TopK Aggregator — at most k
    * rows per group per partition ride the shuffle; never a global or
    * per-group full sort. Returns (strata, id) pairs; join back for
    * payloads. Ties cannot happen (md5 collisions aside) but the id
    * tie-break pins them anyway. */
  def sampleKPerGroup(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    import graft.functions.TopK
    // 52-bit hash: integer-exact in the aggregator's double score
    // (same family as text.Sketches.h52)
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    df.select(col(strataCol), col(idCol).cast("long").as("__id"), h.as("__h"))
      // NULL ids have no hash and cannot be sampled — and a null score
      // would crash the non-nullable TopK Aggregator buffer
      .filter(col("__h").isNotNull && col("__id").isNotNull)
      .groupBy(strataCol)
      .agg(TopK.topK(k)(col("__id"), -col("__h").cast("double")).as("__nn"))
      .select(col(strataCol), posexplode(col("__nn")).as(Seq("__r", "__s")))
      .select(col(strataCol), col("__s.id").as(idCol),
        (col("__r") + 1).cast("int").as("sample_rank"))
  }

  /** Per-EPOCH deterministic reshuffle — the training-loop contract
    * that each epoch visits every document exactly once in a fresh
    * order, reproducibly (resume-safe, engine-portable: the order is
    * a pure function of (epoch, id), never of RNG state or
    * partitioning). One scan generates ALL epochs: the epoch list
    * explodes scan-stage (×E rows), the shard is hashed from
    * (epoch, id) — so shard membership ALSO reshuffles per epoch, not
    * just within-shard order — and the one keyed window runs per
    * (epoch, shard) cell. At 100 TB: E× one shuffle keyed by
    * (epoch, shard), each cell window-sorted independently; no global
    * sort. Output: (epoch, shard, pos, id). */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int,
      epochs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withEpoch = df.select(col(idCol))
      .withColumn("epoch", explode(lit((0 until epochs).toArray)))
    val hx = md5(concat_ws("|", col("epoch").cast("string"),
      col(idCol).cast("string")))
    withEpoch.withColumn("__hx", hx)
      .withColumn("shard",
        (conv(substring(col("__hx"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("__hx"), col(idCol))))
      .select(col("epoch"), col("shard"), col("pos"), col(idCol))
  }

  /** WEIGHTED sample-without-replacement of k rows per stratum —
    * Efraimidis–Spirakis A-ES (IPL 2006): each row draws
    * u ∈ (0, 1] and competes on key = −ln(u)/w; the k SMALLEST keys
    * win, which is exactly a weighted reservoir (selection probability
    * ∝ w, without replacement). "Sample 5 docs per source, biased
    * toward longer/higher-quality ones, reproducibly" is the curation
    * spot-check / eval-set-draw shape.
    *
    * Deterministic and engine-portable: u is derived from the first
    * 52 bits of md5(id) (the [[sampleKPerGroup]] hash family), so the
    * SAME rows win in any engine, run, or partitioning — no RNG. The
    * k-smallest selection runs in the TopK aggregator (map-side
    * combine, no window, no global sort): at 100 TB each partition
    * ships k candidates per stratum. Weights must be > 0.
    * Output: (stratum, id, key rounded to 9, sample_rank). */
  def weightedReservoir(df: DataFrame, strataCol: String, idCol: String,
      weightCol: Column, k: Int): DataFrame = {
    import graft.functions.TopK
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(4503599627370497.0) // (0,1]
    df.select(col(strataCol), col(idCol).cast("long").as("__id"),
        (-log(u) / weightCol.cast("double")).as("__key"))
      .filter(col("__key").isNotNull && col("__id").isNotNull)
      .groupBy(strataCol)
      .agg(TopK.topK(k)(col("__id"), -col("__key")).as("__nn"))
      .select(col(strataCol), posexplode(col("__nn")).as(Seq("__r", "__s")))
      .select(col(strataCol), col("__s.id").as(idCol),
        round(-col("__s.score"), 9).as("res_key"),
        (col("__r") + 1).cast("int").as("sample_rank"))
  }

  /** Token-budget corpus selection — greedy "best score first until
    * the budget is spent", the final assembly step of a curation
    * pipeline ("give me the top-quality ~20M tokens for this mix").
    * A row is selected iff the total weight of all strictly-better
    * rows (higher `score`, then lower `id` among equals) is still
    * below `budget` — so the budget overshoots by at most one row,
    * and the selected set is a deterministic function of the corpus.
    *
    * Scale shape: the naive form is a GLOBAL ordered cumulative sum —
    * a total-order sort of the corpus. This instead (a) aggregates
    * per-score weight totals (score-cardinality rows, tiny — scores
    * are coarse by construction), (b) broadcasts the per-score prefix
    * sums back, so full-in-budget score groups pass with a scan-stage
    * filter, and (c) pays a keyed window ONLY inside the single
    * boundary score group that straddles the budget. Returns
    * (id, score, w) for the selected rows. */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: Column,
      weightCol: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol).cast("long").as("id"),
      scoreCol.cast("long").as("score"), weightCol.cast("long").as("w"))
    // per-score totals + weight of all STRICTLY better score groups;
    // score cardinality is small (coarse quality buckets), so this
    // window sorts a tiny aggregate, never the corpus
    val wS = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = rows.groupBy("score").agg(sum("w").as("__sw"))
      .withColumn("__before", coalesce(sum("__sw").over(wS), lit(0L)))
    val ann = rows.join(broadcast(cum), "score")
    // groups fully inside the budget: every row's strictly-better
    // prefix is < budget, no per-row ordering needed
    val full = ann.filter(col("__before") + col("__sw") <= budget)
    // the one group straddling the budget pays a window over itself
    val wB = Window.partitionBy("score").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = ann
      .filter(col("__before") < budget && col("__before") + col("__sw") > budget)
      .withColumn("__p", coalesce(sum("w").over(wB), lit(0L)))
      .filter(col("__before") + col("__p") < budget)
      .drop("__p")
    full.unionByName(boundary).select("id", "score", "w")
  }

  /** Curriculum-staged global training order (p21): the composition a
    * staged training run actually consumes — every document gets ONE
    * deterministic position `seq` in a total order that visits stages
    * in sequence and pseudo-shuffles within each stage.
    *
    *  - stage: count of `boundaries` ≤ score (fixed thresholds —
    *    production derives them from the p18 quantile sketch, then
    *    freezes them as artifacts like the t19 weights). Ascending
    *    stages train first; callers wanting high-quality-first pass a
    *    negated score.
    *  - within a stage: the p06 shuffle-shard order — shard by
    *    md5(salt|id), then md5-order within the shard — so the
    *    within-stage stream is content-keyed-reproducible, not
    *    RNG-shuffled.
    *  - seq: 1-based global position = the stage/shard offset plus the
    *    within-(stage, shard) rank.
    *
    * Scale shape: the corpus only ever pays KEYED windows — row_number
    * partitioned by (stage, shard), ~stages·shards reducers — and the
    * offsets come from a window over the (stage, shard) COUNT frame
    * (tiny, broadcast back). The naive form is a global total-order
    * sort of the corpus; this is the io11 offset construction applied
    * to training order. Output: (id, stage, shard, seq). */
  def curriculumOrder(df: DataFrame, idCol: String, scoreCol: Column,
      boundaries: Seq[Double], nShards: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      "boundaries must be ascending")
    val stage = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(scoreCol >= b, 1).otherwise(0)
    }
    val hx = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    val rows = df
      .withColumn("stage", stage)
      .withColumn("__hx", hx)
      .withColumn("shard",
        (conv(substring(col("__hx"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("stage"), col("shard"))
          .orderBy(col("__hx"), col(idCol))))
    // (stage, shard) counts — stages·shards rows; the exclusive prefix
    // sum over this tiny frame is each cell's global offset
    val wOff = Window.orderBy(col("stage"), col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy("stage", "shard")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .drop("__n")
    rows.join(broadcast(offsets), Seq("stage", "shard"))
      .select(col(idCol), col("stage"), col("shard"),
        (col("__off") + col("__rn")).as("seq"))
  }

  /** Length-bucketed batch assembly (p22): group documents into
    * fixed-width token-count buckets, order each bucket by content
    * hash, and cut it into `batchSize`-document batches — the standard
    * inference/training batching move that bounds padding waste (a
    * batch pads every member to its own max length; mixing a 10-token
    * and a 4000-token doc in one batch wastes ~8× the useful tokens).
    * Emits one row PER BATCH with its padding accounting:
    * (bucket, batch_idx, n_docs, max_len, sum_len, padding_waste)
    * where padding_waste = n_docs·max_len − sum_len.
    *
    * Deterministic: bucket = floor(len/bucketWidth); batches cut from
    * the (md5(salt|id), id) order WITHIN (bucket, shard) — batching
    * needs length-homogeneity, not bucket-global contiguity, so each
    * bucket hash-shards into `nShards` independently-cut cells and the
    * keyed window runs over bucket·shard cells (bounded reducers at any
    * corpus size — a bare per-bucket window would concentrate the
    * corpus onto ~dozens of reducers). At most one ragged
    * (< batchSize) batch per cell. Output:
    * (bucket, shard, batch_idx, n_docs, max_len, sum_len,
    * padding_waste). */
  def lengthBucketBatches(df: DataFrame, idCol: String, lenCol: Column,
      bucketWidth: Int, batchSize: Int, nShards: Int,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketWidth > 0 && batchSize > 0 && nShards > 0,
      "bucketWidth, batchSize, and nShards must be positive")
    val hx = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    df.select(col(idCol), lenCol.cast("long").as("__len"), hx.as("__hx"))
      .withColumn("bucket", floor(col("__len") / bucketWidth).cast("int"))
      .withColumn("shard",
        (conv(substring(col("__hx"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("bucket"), col("shard"))
          .orderBy(col("__hx"), col(idCol))))
      .withColumn("batch_idx", floor((col("__rn") - 1) / batchSize).cast("int"))
      .groupBy("bucket", "shard", "batch_idx")
      .agg(count(lit(1)).as("n_docs"), max("__len").as("max_len"),
        sum("__len").as("sum_len"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_len") - col("sum_len"))
  }

  /** Proportional source-INTERLEAVE schedule (p23) — stride
    * scheduling applied to the training stream: every row gets a
    * fractional position pos = (rank_within_source − ½) / n_source in
    * (0, 1); consuming rows in pos order interleaves sources
    * proportionally (any prefix holds each source's share to within
    * one row), which is the "don't train on all of wiki then all of
    * crawl" guarantee [[curriculumOrder]] deliberately does NOT give
    * (it stages; this mixes). Within a source the order is the p06
    * content-hash shuffle.
    *
    * Scale shape: the within-source rank uses the p21/io11 offset
    * construction — a (source, shard)-keyed window plus cell-space
    * offsets — so reducers stay bounded even for a source that is 30%
    * of the corpus; pos itself is scan-stage arithmetic. Materializing
    * the schedule in pos order is a range-shard export (io11), not a
    * global sort here. Output: (id, source, rank_in_source, pos). */
  def interleaveBySource(df: DataFrame, idCol: String, strataCol: String,
      nShards: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hx = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    val rows = df.select(col(idCol), col(strataCol).as("source"), hx.as("__hx"))
      .withColumn("shard",
        (conv(substring(col("__hx"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("source"), col("shard"))
          .orderBy(col("__hx"), col(idCol))))
    val wOff = Window.partitionBy("source").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy("source", "shard")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .withColumn("__total", sum("__n").over(Window.partitionBy("source")))
      .drop("__n")
    rows.join(broadcast(offsets), Seq("source", "shard"))
      .withColumn("rank_in_source", col("__off") + col("__rn"))
      .withColumn("pos",
        round((col("rank_in_source") - lit(0.5)) / col("__total"), 9))
      .select(col(idCol), col("source"), col("rank_in_source"), col("pos"))
  }

  def upsample(df: DataFrame, weightCol: Column): DataFrame =
    df.withColumn("copy_no", explode(
      when(weightCol >= 1, sequence(lit(1), weightCol))
        .otherwise(array().cast("array<int>"))))

  /** Training sequence packing WITH intra-document splitting — the
    * step after [[shuffleShards]]/token sharding in an LLM data
    * pipeline: documents are concatenated per stream and sliced into
    * fixed `seqLen`-token training sequences, so a document whose
    * token span crosses a sequence boundary contributes a span to
    * EACH sequence it overlaps. Output: one row per (document,
    * overlapped sequence) with the token count the doc contributes —
    * (streamCol, idCol, seq_id, n_toks).
    *
    * Scale shape: the running token offset is a window PARTITIONED BY
    * STREAM (the p05 form — never one global ordering), and the
    * boundary-span explode emits ⌈n/seqLen⌉+1 rows max per doc. All
    * integer math → exact oracle (p13). Zero-token docs contribute no
    * span and are dropped, like the shingle-less-doc contract. At
    * 100 TB a single source stream can itself be huge — compose with
    * [[shuffleShards]] and pass the shard as `streamCol`, which bounds
    * every window partition at corpus/nShards rows (training pipelines
    * shuffle-shard before packing anyway). */
  def packSequences(df: DataFrame, streamCol: String, idCol: String,
      textCol: String, seqLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(streamCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(streamCol), col(idCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__cum", coalesce(sum("__n").over(w), lit(0L)))
      // doc occupies global token interval [__cum, __cum+__n) →
      // sequences floor(__cum/L) .. floor((__cum+__n−1)/L)
      .withColumn("seq_id", explode(sequence(
        floor(col("__cum") / seqLen).cast("long"),
        floor((col("__cum") + col("__n") - 1) / seqLen).cast("long"))))
      .select(col(streamCol), col(idCol), col("seq_id"),
        (least((col("seq_id") + 1) * seqLen, col("__cum") + col("__n")) -
          greatest(col("seq_id") * seqLen, col("__cum"))).as("n_toks"))
  }

  /** DSIR-style importance selection (data selection via importance
    * resampling, Xie et al. 2023): score every NON-target document by
    * how target-like its hashed-unigram distribution is — the sum over
    * its tokens of log p_target(b)/p_raw(b), where b is the token's
    * hashed bucket in [0, nBuckets) and both class distributions carry
    * add-one smoothing — then draw k docs WITHOUT replacement with
    * probability ∝ exp(score) via the Gumbel-top-k trick. The Gumbel
    * noise derives from the content hash (the p24 A-ES u), so the draw
    * is reproducible across engines, runs, and partitionings — no RNG.
    *
    * Scale shape: class/bucket stats are ONE (bucket)-keyed agg
    * BOUNDED BY nBuckets (not vocab, not corpus) and broadcast back;
    * per-doc scores are a scan-stage explode + broadcast join + one
    * doc-keyed agg; selection is the TopK aggregator (map-side
    * combine, no global sort, no window). At 100 TB the bucket table
    * stays KBs and the only corpus-sized shuffle is the doc-keyed
    * score agg. Buckets hash via md5 (engine-portable), the hashed-
    * feature trick the method itself prescribes to bound the LM.
    * Output: (id, logw, gumbel_key, sel_rank), the k selected rows. */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int, k: Int): DataFrame = {
    import graft.functions.TopK
    val toks = df
      .select(col(idCol).cast("long").as("id"), isTarget.as("__t"),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .withColumn("__b", dsirBucket(col("__tok"), nBuckets))
    val tokC = graft.Caches.cached(toks.select("id", "__t", "__b"))
    val lw = dsirBucketLm(tokC, nBuckets)
    val scores = tokC.filter(!col("__t"))
      .join(broadcast(lw), Seq("__b"))
      .groupBy("id").agg(sum("__lw").as("__logw"))
    val h = conv(substring(md5(col("id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(4503599627370497.0) // (0,1]
    val keyed = scores.withColumn("__key", col("__logw") - log(-log(u)))
    keyed
      .groupBy().agg(TopK.topK(k)(col("id"), col("__key")).as("__nn"))
      .select(posexplode(col("__nn")).as(Seq("__r", "__s")))
      .select(col("__s.id").as("id"), (col("__r") + 1).cast("int")
        .as("sel_rank"))
      .join(keyed, Seq("id"))
      .select(col("id"), round(col("__logw"), 6).as("logw"),
        round(col("__key"), 6).as("gumbel_key"), col("sel_rank"))
  }

  /** The token's DSIR feature bucket: first 16 md5 bits mod nBuckets —
    * engine-portable (`CAST('0x'||substr(md5(tok),1,4) AS BIGINT) % B`). */
  private def dsirBucket(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("long") % nBuckets

  /** The DSIR bucket log-ratio LM over a (__t, __b) token table:
    * (__b, __lw) for every OBSERVED bucket, add-one smoothed. Shared
    * by [[dsirSelect]] (in-memory) and [[writeDsirLm]] (artifact). */
  private def dsirBucketLm(tokC: DataFrame, nBuckets: Int): DataFrame = {
    val cnt = tokC.groupBy("__b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("__rc"))
    val tot = cnt.agg(sum("__tc").as("__tt"), sum("__rc").as("__rt"))
    cnt.crossJoin(broadcast(tot)).select(col("__b"),
      (log((col("__tc") + 1).cast("double") / (col("__tt") + nBuckets)) -
       log((col("__rc") + 1).cast("double") / (col("__rt") + nBuckets)))
        .as("__lw"),
      col("__tt"), col("__rt"))
  }

  /** The (bucket, tc, rc) count rows for one batch — the unit the LM
    * artifact stores and appends. */
  private def dsirBucketCounts(df: DataFrame, textCol: String,
      isTarget: Column, nBuckets: Int): DataFrame =
    df.select(isTarget.as("__t"),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .withColumn("__b", dsirBucket(col("__tok"), nBuckets))
      .groupBy(col("__b").as("bucket")).agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("tc"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("rc"))

  /** Persist the DSIR LM as a serving artifact: a `buckets` parquet of
    * RAW (bucket, tc, rc) counts plus a 1-row `meta` with n_buckets.
    * Counts — not log-ratios — are the stored form because counts are
    * additive: [[appendDsirLm]] grows the LM with a plain parquet
    * append (no rewrite, no read of the existing artifact, the s31
    * posting-append shape), and the read side folds rows per bucket.
    * Smoothed ratios and the unseen-bucket default derive from the
    * counts at read, so the artifact stays self-contained. Train once
    * offline on (target, raw); every later batch or stream scores
    * against the frozen file (the t19 frozen-scorer shape applied to
    * the data-selection LM). */
  def writeDsirLm(df: DataFrame, textCol: String,
      isTarget: Column, nBuckets: Int, path: String): Unit = {
    dsirBucketCounts(df, textCol, isTarget, nBuckets)
      .write.mode("overwrite").parquet(s"$path/buckets")
    df.sparkSession.range(1).select(lit(nBuckets).as("n_buckets"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Grow the LM with a new training batch: counts are additive, so
    * the append is one ≤nBuckets-row parquet append — the production
    * "refresh the selection LM as target/raw corpora grow" path. */
  def appendDsirLm(df: DataFrame, textCol: String, isTarget: Column,
      path: String): Unit = {
    val n = df.sparkSession.read.parquet(s"$path/meta")
      .collect()(0).getAs[Int]("n_buckets")
    dsirBucketCounts(df, textCol, isTarget, n)
      .write.mode("append").parquet(s"$path/buckets")
  }

  /** Load the LM artifact as a DENSE in-memory LUT (size = n_buckets):
    * fold count rows per bucket, derive the smoothed log-ratios, fill
    * unseen buckets with the zero-count default. Bounded by nBuckets —
    * a k×dim-style artifact load, never corpus-sized. */
  def readDsirLut(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Double], Int) = {
    val n = spark.read.parquet(s"$path/meta").collect()(0)
      .getAs[Int]("n_buckets")
    val rows = spark.read.parquet(s"$path/buckets")
      .groupBy("bucket").agg(sum("tc").as("tc"), sum("rc").as("rc"))
      .collect()
    val tt = rows.map(_.getAs[Long]("tc")).sum
    val rt = rows.map(_.getAs[Long]("rc")).sum
    def lw(tc: Long, rc: Long): Double =
      math.log((tc + 1.0) / (tt + n)) - math.log((rc + 1.0) / (rt + n))
    val lut = Array.fill(n)(lw(0L, 0L))
    rows.foreach(r => lut(r.getAs[Long]("bucket").toInt) =
      lw(r.getAs[Long]("tc"), r.getAs[Long]("rc")))
    (lut, n)
  }

  /** Per-document DSIR score from the frozen LUT as ONE scan-stage
    * expression: fold the token array through a constant-folded
    * nBuckets-element array literal — no explode, no join, no
    * aggregation, so it runs identically in a batch projection and a
    * stateless streaming micro-batch. This is the serving half of the
    * artifact: at 100 TB the gate costs one codegen'd pass per row. */
  def dsirScore(lut: Array[Double], nBuckets: Int, text: Column): Column = {
    val lutCol = array(lut.map(lit(_)): _*)
    aggregate(TextOps.tokens(text), lit(0.0d), (acc, t) =>
      acc + element_at(lutCol, (dsirBucket(t, nBuckets) + 1).cast("int")))
  }

  /** Per-user behavioral training sequences (p26): order each user's
    * events by (time, id), then cut sliding windows of `seqLen` events
    * every `stride` — the sequence-model training-example construction
    * (session2vec / SASRec-style next-event prediction feeds). Only
    * FULL windows emit, so the example set is a deterministic function
    * of the log. Window j covers ranks [j·stride+1, j·stride+seqLen];
    * the sequence string is the ordered concatenation of `tokenCol`.
    *
    * Scale shape: the per-user rank is a USER-keyed window (never
    * global); each event then fans out to the ≤⌈seqLen/stride⌉ windows
    * containing it (a bounded explode, no self-join), and assembly is
    * one (user, window)-keyed agg whose groups are exactly seqLen
    * rows. Output: (user, seq_idx, seq). */
  def historySequences(events: DataFrame, userCol: String,
      orderCol: String, idCol: String, tokenCol: String,
      seqLen: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0 && stride > 0, "seqLen and stride must be positive")
    val w = Window.partitionBy(userCol).orderBy(col(orderCol), col(idCol))
    events
      .select(col(userCol), col(tokenCol).as("__tok"),
        row_number().over(w).as("__rn"))
      .withColumn("seq_idx", explode(sequence(
        greatest(lit(0L),
          ceil((col("__rn") - seqLen) / lit(stride.toDouble))).cast("long"),
        floor((col("__rn") - 1) / lit(stride.toDouble)).cast("long"))))
      .groupBy(col(userCol), col("seq_idx"))
      .agg(count(lit(1)).as("__n"),
        expr("array_join(transform(array_sort(" +
          "collect_list(struct(__rn, __tok))), x -> x.__tok), ' ')")
          .as("seq"))
      .filter(col("__n") === seqLen)
      .select(col(userCol), col("seq_idx").cast("int").as("seq_idx"),
        col("seq"))
  }

  /** Repeat-capped budget WATER-FILLING (p30) — the data-constrained
    * scaling allocation (Muennighoff et al. 2023: repeating data
    * beyond ~4 epochs stops paying): split a token `budget` across
    * sources proportionally to integer mixture `weight`s, but no
    * source may supply more than `maxEpochs` × its unique mass. The
    * classic water-filling solution, computed deterministically:
    * sort sources by cap/weight (the rate at which each hits its
    * cap), a source is SATURATED iff every source up to and
    * including it passes the integer cross-multiplication test
    * cap·W_suffix ≤ (budget − cap_prefix)·w (exact — no float
    * thresholds; the running `min` window encodes the water-filling
    * prefix property), saturated sources take their cap, and the
    * rest split the remainder proportionally. The only floating
    * arithmetic is the sort rate (one IEEE division, bit-identical
    * across engines) and the final allocated/epochs outputs.
    *
    * Scale shape: one source-keyed aggregation over the corpus, then
    * every window runs in SOURCE space (tens of rows) — the corpus
    * never sorts. Output: (source, uniq, weight, cap, saturated,
    * allocated 2dp, epochs 4dp). */
  def epochBudgetAllocation(df: DataFrame, sourceCol: String,
      mass: Column, weight: Column, budget: Long, maxEpochs: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && maxEpochs > 0, "budget and maxEpochs positive")
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(mass).cast("long").as("uniq"))
      .withColumn("weight", weight.cast("long"))
      .withColumn("cap", col("uniq") * maxEpochs)
      .withColumn("__r", col("cap").cast("double") / col("weight"))
    val byR = Window.orderBy("__r", "source")
    val full = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("__capPre", coalesce(sum("cap").over(
        byR.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__wSuf", sum("weight").over(
        byR.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("__flag",
        when(col("cap") * col("__wSuf") <=
          (lit(budget) - col("__capPre")) * col("weight"), 1L).otherwise(0L))
      .withColumn("saturated", min("__flag").over(
        byR.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__satCap", sum(col("cap") * col("saturated")).over(full))
      .withColumn("__unsatW",
        sum(col("weight") * (lit(1L) - col("saturated"))).over(full))
      .withColumn("allocated",
        round(when(col("saturated") === 1L, col("cap").cast("double"))
          .otherwise(((lit(budget) - col("__satCap")) * col("weight"))
            .cast("double") / col("__unsatW")), 2))
      .withColumn("epochs", round(col("allocated") / col("uniq"), 4))
      .select("source", "uniq", "weight", "cap", "saturated",
        "allocated", "epochs")
  }

  /** DoReMi-style DOMAIN REWEIGHTING with repetition decay (p31) —
    * the iterative mixture-weight solve (Xie et al. 2023's
    * multiplicative-weights shape) over a REAL per-domain loss: each
    * source's excess-loss proxy is its mean unigram surprisal under
    * the corpus's own empirical distribution (the t06 arithmetic,
    * aggregated per source), and `rounds` multiplicative updates
    * w ← w·exp(η·g) tilt the mixture toward lossy domains while a
    * Muennighoff-flavored repetition penalty g = loss·2^−max(e−1,0)
    * (e = epochs the CURRENT weights imply at budget = corpus size)
    * halves a domain's pull per epoch of repetition it would force —
    * so the fixpoint balances "learn from hard domains" against
    * "don't reread small ones". Deterministic in lockstep with the
    * oracle: every round's weights round to 6 dp, so both engines
    * enter each round with identical inputs (the only cross-engine
    * float risk is a 1-ulp ln/exp/pow boundary landing exactly on a
    * rounding edge).
    *
    * Scale shape: ONE corpus tokenize + token-keyed frequency join
    * (the t06 plan) feeds a source-keyed agg; all `rounds` iterations
    * then run in SOURCE space (tens of rows — the window-over-()
    * frames never see the corpus). Output: (source, n_tok, loss,
    * w_init, w_final, epochs) — epochs under the final mixture. */
  def domainReweight(df: DataFrame, sourceCol: String, textCol: String,
      eta: Double, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1 && eta > 0, "rounds >= 1 and eta > 0")
    val full = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val toks = graft.Caches.cached(df.select(col(sourceCol).as("source"),
      explode(graft.text.TextOps.tokens(col(textCol))).as("tok")))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("__cnt"))
    val nTot = toks.select(count(lit(1)).as("__n_total"))
    val base = toks.join(freq, "tok").crossJoin(broadcast(nTot))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tok"),
        round(-avg(log(col("__cnt").cast("double") / col("__n_total"))), 6)
          .as("loss"))
      .withColumn("__N", sum("n_tok").over(full))
    var cur = base.withColumn("w",
      round(col("n_tok").cast("double") / col("__N"), 6))
    (1 to rounds).foreach { _ =>
      cur = cur
        .withColumn("__g", col("loss") * pow(lit(2.0),
          -greatest(col("__N") * col("w") / col("n_tok") - 1, lit(0.0))))
        .withColumn("__raw", col("w") * exp(lit(eta) * col("__g")))
        .withColumn("w", round(col("__raw") / sum("__raw").over(full), 6))
        .drop("__g", "__raw")
    }
    cur
      .withColumn("w_init", round(col("n_tok").cast("double") / col("__N"), 6))
      .withColumn("epochs", round(col("__N") * col("w") / col("n_tok"), 4))
      .select(col("source"), col("n_tok"), col("loss"), col("w_init"),
        col("w").as("w_final"), col("epochs"))
  }

  /** Phase-interpolated MIXTURE SCHEDULE (p33) — the multi-phase data
    * schedule production training runs actually execute (anneal from
    * the natural mixture toward a solved one across curriculum
    * phases, the Llama-3 / MiniCPM two-phase shape generalized):
    * `weights` carries (source, w_init, w_final) — e.g.
    * [[domainReweight]]'s endpoints — and phase t of `phases` gets
    * w_t = round₆((1−α)·w_init + α·w_final) at α = t/(phases−1),
    * plus its integer token allocation floor(phaseBudget · w_t).
    * Endpoints sum to 1, so every interpolated phase does too (to
    * 6-dp rounding). Keep `phases` such that every α is dyadic
    * (5 → 0, ¼, ½, ¾, 1) and the arithmetic is engine-exact up to
    * the documented 1-ulp rounding-edge risk every 6-dp query
    * carries. Output: (phase, source, w, phase_tokens).
    *
    * Scale shape: pure source-space arithmetic — the corpus is never
    * touched; the output is phases × sources rows that [[mixFromWeights]]
    * turns into per-phase training sets. */
  def mixtureSchedule(weights: DataFrame, phases: Int,
      phaseBudget: Long): DataFrame = {
    require(phases >= 2, "phases >= 2")
    val ph = explode(array((0 until phases).map { t =>
      struct(lit(t).as("phase"),
        lit(t.toDouble / (phases - 1)).as("alpha"))
    }: _*))
    weights.withColumn("__p", ph)
      .withColumn("w", round((lit(1.0) - col("__p.alpha")) * col("w_init") +
        col("__p.alpha") * col("w_final"), 6))
      .select(col("__p.phase").as("phase"), col("source"), col("w"),
        floor(lit(phaseBudget) * col("w")).cast("long").as("phase_tokens"))
  }

  /** Materialize a whole mixture SCHEDULE in one corpus pass (p34) —
    * [[mixFromWeights]] generalized over the phase axis: `schedule`
    * is a (phase, source, w) table ([[mixtureSchedule]]'s output) and
    * every document joins its source's phases-sized threshold slice
    * (a broadcast fan-out of exactly `phases` rows per doc), keeping
    * the (doc, phase) pairs whose content-hash bucket clears that
    * phase's rate. ONE scan + ONE phase-aware broadcast join replaces
    * a scan per phase — at 100 TB the difference between reading the
    * corpus once and reading it `phases` times. Same integer
    * threshold arithmetic as [[mixFromWeights]], so the per-phase
    * slices are identical to running it per phase. */
  def mixFromSchedule(df: DataFrame, strataCol: String, tokens: Column,
      key: Column, schedule: DataFrame, budgetTokens: Long,
      nBuckets: Int = 1000000): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(sum(tokens).as("__n"))
    val thresholds = counts.join(schedule, strataCol)
      .withColumn("__q",
        least(lit(1.0), lit(budgetTokens) * col("w") / col("__n")))
      .withColumn("__thr", floor(round(col("__q"), 6) * nBuckets).cast("long"))
      .select(col("phase"), col(strataCol), col("__thr"))
    df.join(broadcast(thresholds), Seq(strataCol))
      .filter(hashBucket(key, nBuckets) < col("__thr"))
      .drop("__thr")
  }

  /** Materialize a SOLVED mixture (p32) — the APPLY step after a
    * domain-reweighting solve: `weights` is a source-count-sized
    * (source, w) table (e.g. [[domainReweight]]'s w_final, Σw = 1);
    * each source keeps documents at rate min(1, budget·w / tokens_s)
    * decided by the p04/p20 content-hash bucket rule, so the
    * realized mix approaches the solved shares deterministically.
    * The two IEEE ops (budget·w, then /tokens_s) round to 6 dp and
    * floor to an integer bucket threshold — the keep decision is an
    * exact integer compare in any engine.
    *
    * Scale shape: one per-source token agg, a source-count-sized
    * broadcast threshold join, a scan-stage hash filter — the corpus
    * never shuffles, and the weight solve it consumes already ran in
    * source space. */
  def mixFromWeights(df: DataFrame, strataCol: String, tokens: Column,
      key: Column, weights: DataFrame, budgetTokens: Long,
      nBuckets: Int = 1000000): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(sum(tokens).as("__n"))
    val thresholds = counts.join(weights, strataCol)
      .withColumn("__q",
        least(lit(1.0), lit(budgetTokens) * col("w") / col("__n")))
      .withColumn("__thr", floor(round(col("__q"), 6) * nBuckets).cast("long"))
      .select(col(strataCol), col("__thr"))
    df.join(broadcast(thresholds), Seq(strataCol), "left")
      .filter(col("__thr").isNotNull && hashBucket(key, nBuckets) < col("__thr"))
      .drop("__thr")
  }
}
