package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Bottom-k (KMV) sketches over document content — the mergeable
  * distinct-counting / set-overlap primitive a 100 TB corpus audit
  * runs instead of exact distinct joins: per group, keep only the k
  * smallest hash values of the distinct members; any two groups'
  * sketches then answer distinct-count and Jaccard-overlap questions
  * in sketch space (k rows each), never by rescanning the corpus.
  *
  * The hash is the first 52 bits of md5 — exactly representable in a
  * double AND replayable in DuckDB, so every sketch member, estimate,
  * and overlap is oracle-checkable bit-for-bit (no tolerance bands
  * needed: the estimator is deterministic given the data).
  *
  * Scale shape: sketch construction is a distinct on (group, hash) —
  * one keyed shuffle — followed by the map-side-combining TopK
  * Aggregator (≤ k rows per group per partition ride the agg
  * shuffle). Pairwise overlap then runs entirely in sketch space:
  * |groups|² × k rows, independent of corpus size.
  */
object Sketches {

  /** 52-bit uniform content hash (13 md5 hex chars) — integer-exact in
    * a double, portable across engines. */
  val H_MAX: Double = math.pow(2, 52) // 13 hex digits
  def h52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** Bottom-k sketch per group: the k smallest distinct h52 values of
    * `valueCol`, as a sorted array. */
  def bottomK(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    df.select(col(groupCol), h52(col(valueCol)).as("__h"))
      // NULL values have no hash and cannot be sketched — and a null
      // score would crash the non-nullable TopK Aggregator buffer
      .filter(col("__h").isNotNull)
      .distinct()
      .groupBy(groupCol)
      // TopK keeps largest scores; bottom-k = top-k of the negated
      // hash. h < 2^52 is exact in the double score, so the selection
      // (and the id tie-break on equal doubles) is exactly ascending h.
      .agg(TopK.topK(k)(col("__h"), -col("__h").cast("double")).as("__nn"))
      .select(col(groupCol),
        array_sort(transform(col("__nn"), _.getField("id"))).as("sketch"))

  /** KMV distinct estimate per group: D̂ = (k−1)·2⁵²/h_k when the
    * sketch is full, |sketch| exactly otherwise (the standard KMV
    * estimator). Output: (group, n_sketch, est_distinct). */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    bottomK(df, groupCol, valueCol, k)
      .select(col(groupCol), size(col("sketch")).as("n_sketch"),
        round(when(size(col("sketch")) < k,
            size(col("sketch")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(H_MAX) /
            element_at(col("sketch"), k).cast("double")), 4)
          .as("est_distinct"))

  /** Count-min sketch over corpus tokens + heavy-hitter audit — the
    * FREQUENCY sibling of the distinct-count sketches above, and the
    * constant-memory way a 100 TB corpus finds its dominant tokens
    * (boilerplate markers, spam phrases) without a full token
    * group-by: `d` hash rows × `w` counters, each token incrementing
    * one cell per row; est(tok) = min over rows of its cell — the
    * classic one-sided estimator (always ≥ the true count, error
    * bounded by collisions/w per row).
    *
    * Determinism: row hashes are salted h52 md5 (`cms<i>|token`), so
    * every cell, estimate, and the ≥-true invariant replay exactly in
    * the oracle — no tolerance bands. Scale shape: the sketch build is
    * ONE keyed shuffle on (row, cell) into ≤ d·w cells (mergeable
    * across shards by cell-wise +); the audit joins the top-N exact
    * tokens against the BROADCAST sketch (d·w rows — constant).
    * Output: (tok, true_cnt, cms_est), top `topN` tokens by exact
    * count, est ≥ true by construction. */
  def cmsHeavyHitters(df: DataFrame, textCol: String, d: Int, w: Int,
      topN: Int): DataFrame = {
    val toks = graft.Caches.cached(
      df.select(explode(TextOps.tokens(col(textCol))).as("tok")))
    cmsAudit(cmsCells(toks, "tok", d, w), toks, "tok", d, w, topN)
  }

  /** The d probe coordinates of a token under the salted-h52 row-hash
    * family: array of (r, c) structs, c = h52("cms<r>|tok") mod w. */
  private def cmsCoords(tok: Column, d: Int, w: Int): Column =
    array((0 until d).map(i => struct(lit(i).as("r"),
      pmod(h52(concat(lit(s"cms$i|"), tok)), lit(w.toLong)).cast("int")
        .as("c"))): _*)

  /** Count-min sketch CELLS (r, c, cell_cnt) from a token frame. The
    * groupBy keys onto ≤ d·w cells, so on a STREAMING frame this is a
    * constant-bounded stateful aggregate (complete mode, no watermark
    * needed): the state IS the sketch — the ingest-time frequency
    * monitor shape (sw12). */
  def cmsCells(toks: DataFrame, tokCol: String, d: Int, w: Int): DataFrame =
    toks.select(explode(cmsCoords(col(tokCol), d, w)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cell_cnt"))

  /** Audit the exact top-N tokens of `toks` against a prebuilt
    * (r, c, cell_cnt) sketch (broadcast — ≤ d·w rows, constant).
    * Output: (tok, true_cnt, cms_est), est ≥ true by construction. */
  def cmsAudit(sketch: DataFrame, toks: DataFrame, tokCol: String,
      d: Int, w: Int, topN: Int): DataFrame =
    toks.groupBy(col(tokCol).as("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(topN)
      .select(col("tok"), col("cnt"), explode(cmsCoords(col("tok"), d, w)).as("rc"))
      .select(col("tok"), col("cnt"), col("rc.r").as("r"), col("rc.c").as("c"))
      .join(broadcast(sketch), Seq("r", "c"))
      .groupBy("tok", "cnt")
      .agg(min("cell_cnt").as("cms_est"))
      .select(col("tok"), col("cnt").as("true_cnt"), col("cms_est"))

  /** Mergeable fixed-width HISTOGRAM quantile sketch — the
    * constant-memory way a 100 TB corpus reads its per-source
    * length/score distributions (sequence-length planning, quality
    * thresholds) without a full sort: bucket `value` into
    * floor(v/width) cells, then answer each quantile q as the lower
    * edge of the first bucket whose cumulative count reaches
    * ceil(q·total). Deterministic given the data, so every cell and
    * estimate replays exactly in SQL — no tolerance bands.
    *
    * Scale shape: the histogram build is ONE keyed shuffle into
    * |groups|·|buckets| cells (mergeable across shards by cell-wise
    * +, the same contract as the KMV/CMS sketches above); the
    * cumulative window and quantile extraction run entirely in cell
    * space, never on rows. Output: (group, q, n_rows, bucket_lo) long
    * form, one row per (group, quantile). */
  def histogramQuantiles(df: DataFrame, groupCol: String, value: Column,
      width: Int, qs: Seq[Double]): DataFrame =
    histQuantilesFromCells(
      histCells(df, groupCol, value, width), groupCol, width, qs)

  /** Histogram CELLS (g, b, cnt) — the mergeable half of
    * [[histogramQuantiles]], split out so the cells can be MAINTAINED
    * on a stream (sw15): the streaming groupBy keys onto
    * |groups|·|buckets| cells, so state is the sketch itself —
    * bounded by the value range / width, not the corpus (complete
    * mode, no watermark; the cmsCells contract). */
  def histCells(df: DataFrame, groupCol: String, value: Column,
      width: Int): DataFrame =
    df.select(col(groupCol).as("g"),
        floor(value / width).cast("long").as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("cnt"))

  /** Quantile extraction over prebuilt (g, b, cnt) cells — runs
    * entirely in CELL space (the windows order ≤ |buckets| rows per
    * group), shared by the batch and streamed forms. */
  def histQuantilesFromCells(cells: DataFrame, groupCol: String,
      width: Int, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = cells
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("g").orderBy("b")))
      .withColumn("total", sum("cnt").over(Window.partitionBy("g")))
    cum.select(col("g"), col("b"), col("cum"), col("total"),
        explode(array(qs.map(q => struct(lit(q).as("q"),
          ceil(lit(q) * col("total")).cast("long").as("thr"))): _*)).as("qt"))
      .filter(col("cum") >= col("qt.thr"))
      .groupBy(col("g"), col("qt.q").as("q"))
      .agg(max("total").as("n_rows"), min("b").as("bmin"))
      .select(col("g").as(groupCol), col("q"), col("n_rows"),
        (col("bmin") * width).as("bucket_lo"))
  }

  /** Per-group score CALIBRATION via the histogram CDF (t24): map each
    * row's score in [0, 1) to its within-group percentile,
    * pct = (Σ counts of lower buckets + ½·own bucket) / group total —
    * the per-source normalization a curation pipeline applies before
    * using one global threshold ("keep the top 30% OF EACH source",
    * not "above 0.7 absolute", because score distributions differ by
    * source). `scored` is (id, group, score).
    *
    * Scale shape: one (group, bucket) cell aggregate (tiny —
    * |groups|·width rows; the [[histCells]] family), CDF windows in
    * CELL space only, then the cells broadcast back onto a scan-stage
    * join — the corpus never sorts or windows. Deterministic: bucket
    * edges are exact integer floors of score·width; the percentile is
    * one double divide replayed identically in SQL. Output:
    * (id, group, score, pct). */
  def histPercentileCalibration(scored: DataFrame, width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = scored.toDF("id", "g", "score")
      .withColumn("b",
        least(floor(col("score") * width).cast("int"), lit(width - 1)))
    val wCdf = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cdf = rows.groupBy("g", "b").agg(count(lit(1)).as("cnt"))
      .withColumn("below", coalesce(sum("cnt").over(wCdf), lit(0L)))
      .withColumn("total", sum("cnt").over(Window.partitionBy("g")))
    rows.join(broadcast(cdf), Seq("g", "b"))
      .withColumn("pct",
        round((col("below") + lit(0.5) * col("cnt")) / col("total"), 6))
      .select(col("id"), col("g"), col("score"), col("pct"))
  }

  /** Pairwise Jaccard overlap between every two groups, estimated in
    * sketch space: for each group pair (a < b), take the bottom-k of
    * the UNION of their sketches and count how many of those hashes
    * appear in both — J ≈ |both| / |union sketch|. All joins below are
    * over sketch rows (≤ k per group), so the whole comparison is
    * |groups|²·k work regardless of corpus size; the per-pair rank
    * window orders ≤ 2k rows. Output: (group_a, group_b, k_used,
    * jaccard_est). */
  def jaccardOverlap(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = graft.Caches.cached(
      bottomK(df, groupCol, valueCol, k)
        .select(col(groupCol).as("g"), explode(col("sketch")).as("h")))
    val pairs = rows.select(col("g").as("ga")).distinct()
      .join(rows.select(col("g").as("gb")).distinct(), col("ga") < col("gb"))
    // two broadcast equi-joins (never an OR-predicate nested loop):
    // each pair pulls in its two sketches, flags merge per hash
    val tagged = broadcast(pairs).join(rows.toDF("ga", "h"), "ga")
      .select(col("ga"), col("gb"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionAll(broadcast(pairs).join(rows.toDF("gb", "h"), "gb")
        .select(col("ga"), col("gb"), col("h"), lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy("ga", "gb", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val w = Window.partitionBy("ga", "gb").orderBy("h")
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("ga").as("group_a"), col("gb").as("group_b"))
      .agg(count(lit(1)).as("k_used"),
        round(sum(col("in_a") * col("in_b")).cast("double") / count(lit(1)), 6)
          .as("jaccard_est"))
  }
}
