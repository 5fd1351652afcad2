package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained AGGREGATE materialized view over a
  * snapshot table (io26/sw37) — the "don't rescan 100 TB to refresh a
  * dashboard" primitive every lakehouse deployment ends up building:
  *
  *   - `build` computes `GROUP BY keyCols → (count, sum(sumCols))`
  *     over the table's LATEST snapshot and publishes the result as a
  *     snapshot table of its own (so the MV itself is versioned,
  *     time-travelable, and CAS-committed like any other table),
  *     recording the base-table version it reflects.
  *   - `refresh` reads ONLY the Delta-CDF change feed between the
  *     recorded base version and the current one
  *     ([[Sources.snapshotChangesCdf]]), folds it into per-key deltas
  *     (insert/update_postimage rows add, delete/update_preimage rows
  *     subtract — count and sum are abelian-group aggregates, so the
  *     delta is exact), and merges the delta into the old MV with one
  *     keyed full-outer join. Keys whose count reaches zero leave the
  *     view. Work ∝ |changes| + |view|, never ∝ |table|.
  *
  * EXACTNESS: counts and sums of integral/decimal columns maintain
  * bit-identically to a full recompute (the io26 gate proves refresh ≡
  * rebuild under a DuckDB oracle). Float sums are order-sensitive —
  * cast to decimal first (the FeatureScaler moment-artifact rule).
  * Non-subtractable aggregates (min/max) use the second canonical IVM
  * strategy instead — affected-group re-aggregation
  * ([[buildMinMax]]/[[refreshMinMax]]).
  *
  * CONCURRENCY: one refresher per MV (the scheduler's contract —
  * Delta's OPTIMIZE has the same shape). The MV commit itself is an
  * overwrite through the CAS protocol, so a racing second refresher
  * fails loudly at the commit point instead of corrupting the view.
  *
  * At 100 TB: the CDF join touches two pinned snapshot scans of the
  * base table — at production commit cadence `fromVersion` is recent,
  * and with range-clustered ingest (io11/io18) both scans prune to
  * the commits the versions don't share; the delta agg is map-side
  * combined on the view's keys; the merge shuffles |view| + |delta|
  * rows only. */
object MaterializedView {

  /** Aggregate spec shared by build and refresh: per-key row count
    * plus one sum per `sumCols` entry, aliased `mv_count` /
    * `sum_<col>` (the oracle-name contract). With `withAvg`, a
    * per-column NON-NULL count (`cnt_<col>`) rides along — the
    * denominator avg() needs (avg ignores nulls, mv_count does not),
    * which is what lets [[graft.plans.MvRewrite]] answer avg queries
    * from the view (io33). Also abelian, so both refresh paths
    * maintain it exactly. */
  private def aggOf(df: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String], withAvg: Boolean = false): DataFrame = {
    val sums = sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    val cnts = if (withAvg) sumCols.map(c => count(col(c)).as(s"cnt_$c"))
      else Nil
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("mv_count"), (sums ++ cnts): _*)
  }

  private def statePath(mvPath: String) = s"$mvPath/mv_state"

  private def writeState(spark: SparkSession, mvPath: String,
      baseVersion: Int, keyCols: Seq[String], sumCols: Seq[String],
      rowKey: String, lgK: Int = 0): Unit = {
    import spark.implicits._
    // lg_k is 0 for non-distinct views; distinct views persist their
    // sketch width so refresh can never union mismatched lgConfigK
    // registers (hll_union rejects them) — the build's lgK is part of
    // the view's identity, not a refresh-time knob
    Seq((baseVersion, keyCols.mkString(","), sumCols.mkString(","), rowKey,
        lgK))
      .toDF("base_version", "key_cols", "sum_cols", "row_key", "lg_k")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(statePath(mvPath))
  }

  /** Version `v`'s commit-dir set (driver-sized, like every manifest
    * fetch). */
  private def commitSet(spark: SparkSession, tablePath: String,
      v: Int): Set[String] = {
    import spark.implicits._
    Sources.manifestOf(spark, tablePath)
      .getOrElse(sys.error(s"no snapshot table at $tablePath"))
      .filter(col("version") === v)
      .select("commit").as[String].collect().toSet
  }

  /** The base-table version the MV currently reflects. */
  def baseVersion(spark: SparkSession, mvPath: String): Int =
    spark.read.parquet(statePath(mvPath)).head.getAs[Int]("base_version")

  /** Full-compute the view at the base table's latest version and
    * publish it (build = the only full scan this MV ever does).
    * `rowKey` is the base table's row-identity column the CDF diffs
    * on during refresh. Returns the MV's snapshot version. */
  def build(spark: SparkSession, tablePath: String, mvPath: String,
      rowKey: String, keyCols: Seq[String], sumCols: Seq[String],
      withAvg: Boolean = false): Int = {
    val v = Sources.snapshotLatestVersion(spark, tablePath)
    require(v > 0, s"no snapshot table at $tablePath")
    val mv = aggOf(Sources.snapshotRead(spark, tablePath, v),
      keyCols, sumCols, withAvg)
    val mvv = Sources.snapshotCommit(mv, mvPath, overwrite = true)
    writeState(spark, mvPath, v, keyCols, sumCols, rowKey)
    mvv
  }

  /** Fold the base table's changes since the last build/refresh into
    * the view. No-op (returns the current MV version) when the base
    * hasn't moved. Returns the MV's new snapshot version. */
  def refresh(spark: SparkSession, tablePath: String,
      mvPath: String): Int = {
    val st = spark.read.parquet(statePath(mvPath)).head
    val fromV = st.getAs[Int]("base_version")
    val keyCols = st.getAs[String]("key_cols").split(",").toSeq
    val sumCols = st.getAs[String]("sum_cols").split(",").toSeq
      .filter(_.nonEmpty)
    val rowKey = st.getAs[String]("row_key")
    val toV = Sources.snapshotLatestVersion(spark, tablePath)
    val mvV = Sources.snapshotLatestVersion(spark, mvPath)
    if (toV == fromV) return mvV
    // APPEND-ONLY fast path: when toV's commit set carries fromV's
    // whole set (the streaming-ingest norm — sw37), the change feed
    // is exactly the NEW commit dirs' rows, all inserts, so the
    // refresh reads |appended rows| and runs NO diff join at all.
    // Manifest commit sets are version-count-sized driver work.
    val old = Sources.snapshotRead(spark, mvPath, mvV)
    // avg-capable views (build(withAvg = true)) carry per-column
    // non-null counts; detect by presence so plain views are untouched
    val withAvg = sumCols.nonEmpty && old.columns.contains(s"cnt_${sumCols.head}")
    val fromSet = commitSet(spark, tablePath, fromV)
    val toSet = commitSet(spark, tablePath, toV)
    val delta = if (fromSet.subsetOf(toSet)) {
      val newDirs = (toSet -- fromSet).toSeq.sorted
        .map(c => Sources.commitDir(tablePath, c))
      if (newDirs.isEmpty) { // same content re-published (e.g. restore)
        writeState(spark, mvPath, toV, keyCols, sumCols, rowKey)
        return mvV
      }
      val dSums = sumCols.map(c => sum(col(c)).as(s"__d_$c"))
      val dCnts = if (withAvg)
        sumCols.map(c => count(col(c)).as(s"__dc_$c")) else Nil
      spark.read.parquet(newDirs: _*)
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__d_count"), (dSums ++ dCnts): _*)
    } else {
      val cdf = Sources.snapshotChangesCdf(spark, tablePath, rowKey,
        fromV, toV)
      // abelian fold: post-images add, pre-images/deletes subtract
      val sign = when(col("change").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      val dSums = sumCols.map(c => sum(sign * col(c)).as(s"__d_$c"))
      val dCnts = if (withAvg) sumCols.map(c =>
        sum(when(col(c).isNotNull, sign).otherwise(lit(0L))).as(s"__dc_$c"))
        else Nil
      cdf.groupBy(keyCols.map(col): _*)
        .agg(sum(sign).as("__d_count"), (dSums ++ dCnts): _*)
    }
    def z(c: org.apache.spark.sql.Column) = coalesce(c, lit(0L))
    val mergedCnts = if (withAvg) sumCols.map(c =>
      (z(col(s"cnt_$c")) + z(col(s"__dc_$c"))).as(s"cnt_$c")) else Nil
    val merged = old.join(delta, keyCols, "full_outer")
      .select(keyCols.map(col) ++
        Seq((z(col("mv_count")) + z(col("__d_count"))).as("mv_count")) ++
        sumCols.map(c =>
          (z(col(s"sum_$c")) + z(col(s"__d_$c"))).as(s"sum_$c")) ++
        mergedCnts: _*)
      .filter(col("mv_count") > 0)
    val newMvV = Sources.snapshotCommit(merged, mvPath, overwrite = true)
    writeState(spark, mvPath, toV, keyCols, sumCols, rowKey)
    newMvV
  }

  /** Register this view for TRANSPARENT aggregate rewrite
    * ([[graft.plans.MvRewrite]], io28): queries written against the
    * base table's CURRENT snapshot answer from the view instead. The
    * registration snapshots both dir sets — the base version's data
    * dirs (so the rule matches only reads of exactly the version the
    * view reflects: staleness = structural non-match) and the view's
    * own dirs to scan in its place. Re-register after every
    * build/refresh. */
  def registerForRewrite(spark: SparkSession, tablePath: String,
      mvPath: String): Unit = {
    val st = spark.read.parquet(statePath(mvPath)).head
    val baseV = st.getAs[Int]("base_version")
    val keyCols = st.getAs[String]("key_cols").split(",").toSeq
    val sumCols = st.getAs[String]("sum_cols").split(",").toSeq
      .filter(_.nonEmpty)
    def dirsOf(path: String, v: Int): Seq[String] =
      commitSet(spark, path, v).toSeq.sorted
        .map(c => qualify(spark, Sources.commitDir(path, c)))
    val baseDirs = dirsOf(tablePath, baseV)
    val mvDirs = dirsOf(mvPath, Sources.snapshotLatestVersion(spark, mvPath))
    graft.plans.MvRewrite.enable(spark)
    graft.plans.MvRewrite.register(spark, graft.plans.MvRewrite.Entry(
      baseDirs.toSet, mvDirs, keyCols, sumCols.toSet))
  }

  /** Register a [[buildDistinct]] view for TRANSPARENT
    * approx_count_distinct rewrite (io34): queries asking
    * `approx_count_distinct(<distinctCol>)` against the base table's
    * current snapshot answer from the view's HLL registers instead.
    * EXPLICIT OPT-IN: the rewrite swaps HLL++ for Datasketches — the
    * value changes within the approximate contract, which is the
    * caller's to accept (BigQuery/Snowflake sketch-MV semantics);
    * exact count(DISTINCT) never rewrites. Staleness is structural,
    * as in [[registerForRewrite]]. */
  def registerDistinctForRewrite(spark: SparkSession, tablePath: String,
      mvPath: String): Unit = {
    val st = spark.read.parquet(statePath(mvPath)).head
    val baseV = st.getAs[Int]("base_version")
    val keyCols = st.getAs[String]("key_cols").split(",").toSeq
    val distinctCol = st.getAs[String]("sum_cols")
    def dirsOf(path: String, v: Int): Seq[String] =
      commitSet(spark, path, v).toSeq.sorted
        .map(c => qualify(spark, Sources.commitDir(path, c)))
    val baseDirs = dirsOf(tablePath, baseV)
    val mvDirs = dirsOf(mvPath, Sources.snapshotLatestVersion(spark, mvPath))
    graft.plans.MvRewrite.enable(spark)
    graft.plans.MvRewrite.register(spark, graft.plans.MvRewrite.Entry(
      baseDirs.toSet, mvDirs, keyCols, Set.empty, Set(distinctCol)))
  }

  /** Register a [[buildMinMax]] view for TRANSPARENT min/max rewrite
    * (io35): `min(<valCol>)`/`max(<valCol>)` against the base table's
    * current snapshot answer from the view's min_/max_ columns —
    * exact projections at the view's keys, exact re-aggregation (min
    * of mins / max of maxes) for rollups. count(*) rides on mv_count
    * as in every view class. Staleness structural, as in
    * [[registerForRewrite]]. */
  def registerMinMaxForRewrite(spark: SparkSession, tablePath: String,
      mvPath: String): Unit = {
    val st = spark.read.parquet(statePath(mvPath)).head
    val baseV = st.getAs[Int]("base_version")
    val keyCols = st.getAs[String]("key_cols").split(",").toSeq
    val valCol = st.getAs[String]("sum_cols")
    def dirsOf(path: String, v: Int): Seq[String] =
      commitSet(spark, path, v).toSeq.sorted
        .map(c => qualify(spark, Sources.commitDir(path, c)))
    val baseDirs = dirsOf(tablePath, baseV)
    val mvDirs = dirsOf(mvPath, Sources.snapshotLatestVersion(spark, mvPath))
    graft.plans.MvRewrite.enable(spark)
    graft.plans.MvRewrite.register(spark, graft.plans.MvRewrite.Entry(
      baseDirs.toSet, mvDirs, keyCols, Set.empty,
      minMaxCols = Set(valCol)))
  }

  private def qualify(spark: SparkSession, p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(hp).toString
  }

  // ---- non-subtractable aggregates: affected-group re-aggregation --
  //
  // min/max (and distinct counts) are NOT abelian — a deleted row can
  // be the current minimum, and no delta arithmetic recovers the
  // runner-up. The canonical IVM strategy (Gupta–Mumick's "not
  // self-maintainable" case) is to RE-AGGREGATE exactly the groups the
  // change feed touched: one semi-join restricts the base scan to
  // affected groups (partition/zone pruning applies when the table is
  // clustered by the group key — io18's layout), every untouched group
  // row is carried over by an anti-join. Work ∝ rows-in-affected-groups
  // + |view|, never ∝ |table|.

  /** Full-compute a min/max-bearing view ((count, min, max) per key —
    * the zone-map-shaped MV) and publish it. */
  def buildMinMax(spark: SparkSession, tablePath: String, mvPath: String,
      rowKey: String, keyCols: Seq[String], valCol: String): Int = {
    val v = Sources.snapshotLatestVersion(spark, tablePath)
    require(v > 0, s"no snapshot table at $tablePath")
    val mv = minMaxAgg(Sources.snapshotRead(spark, tablePath, v),
      keyCols, valCol)
    val mvv = Sources.snapshotCommit(mv, mvPath, overwrite = true)
    writeState(spark, mvPath, v, keyCols, Seq(valCol), rowKey)
    mvv
  }

  private def minMaxAgg(df: DataFrame, keyCols: Seq[String],
      valCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("mv_count"),
        min(col(valCol)).as(s"min_$valCol"),
        max(col(valCol)).as(s"max_$valCol"))

  // ---- join-aggregate views over a stable dimension ----------------
  //
  // The star-schema MV (Gupta–Mumick's SPJ+aggregate class): the view
  // is `fact ⋈ dim GROUP BY dim keys → (count, sums of fact cols)`.
  // Because every fact row reaches the view through its OWN dim match,
  // fact-side changes stay abelian — insert adds, delete subtracts,
  // update moves mass — each CDF row just re-joins the (broadcast-
  // sized) dimension to find its group. The DIMENSION is the stated
  // stability contract: it is assumed unchanged between build and
  // refresh (the slowly-changing-dimension norm — rebuild, or version
  // the dim and re-register, when it moves); the refresh re-reads it
  // from `dimPath`, so a changed dim mis-attributes deltas — document,
  // don't guess.

  private def joinAggState(mvPath: String) = s"$mvPath/join_state"

  /** Full-compute `fact ⋈ dim GROUP BY keyCols` (count + sums of fact
    * columns) over the fact table's latest snapshot and publish it.
    * `dim` must carry `joinKey` and `keyCols`; `factPath` rows carry
    * `joinKey`, `rowKey`, and `sumCols`. */
  def buildJoinAgg(spark: SparkSession, factPath: String, dim: DataFrame,
      dimPath: String, mvPath: String, rowKey: String, joinKey: String,
      keyCols: Seq[String], sumCols: Seq[String]): Int = {
    val v = Sources.snapshotLatestVersion(spark, factPath)
    require(v > 0, s"no snapshot table at $factPath")
    dim.write.mode(SaveMode.Overwrite).parquet(dimPath)
    val joined = Sources.snapshotRead(spark, factPath, v)
      .join(org.apache.spark.sql.functions.broadcast(
        spark.read.parquet(dimPath)), joinKey)
    val mvv = Sources.snapshotCommit(aggOf(joined, keyCols, sumCols), mvPath,
      overwrite = true)
    import spark.implicits._
    Seq((v, keyCols.mkString(","), sumCols.mkString(","), rowKey, joinKey,
        dimPath))
      .toDF("base_version", "key_cols", "sum_cols", "row_key", "join_key",
        "dim_path")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(joinAggState(mvPath))
    mvv
  }

  /** Fold fact-side changes into a [[buildJoinAgg]] view: the signed
    * CDF delta (append-only fast path: just the new dirs) re-joins the
    * frozen dimension, aggregates per key, and merges — work ∝
    * |changes| ⋈ broadcast(dim) + |view|, never ∝ |fact|. */
  def refreshJoinAgg(spark: SparkSession, factPath: String,
      mvPath: String): Int = {
    val st = spark.read.parquet(joinAggState(mvPath)).head
    val fromV = st.getAs[Int]("base_version")
    val keyCols = st.getAs[String]("key_cols").split(",").toSeq
    val sumCols = st.getAs[String]("sum_cols").split(",").toSeq
      .filter(_.nonEmpty)
    val rowKey = st.getAs[String]("row_key")
    val joinKey = st.getAs[String]("join_key")
    val dim = org.apache.spark.sql.functions.broadcast(
      spark.read.parquet(st.getAs[String]("dim_path")))
    val toV = Sources.snapshotLatestVersion(spark, factPath)
    val mvV = Sources.snapshotLatestVersion(spark, mvPath)
    if (toV == fromV) return mvV
    val fromSet = commitSet(spark, factPath, fromV)
    val toSet = commitSet(spark, factPath, toV)
    val delta = if (fromSet.subsetOf(toSet)) {
      val newDirs = (toSet -- fromSet).toSeq.sorted
        .map(c => Sources.commitDir(factPath, c))
      if (newDirs.isEmpty) {
        writeJoinAggVersion(spark, mvPath, toV)
        return mvV
      }
      spark.read.parquet(newDirs: _*).join(dim, joinKey)
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__d_count"),
          sumCols.map(c => sum(col(c)).as(s"__d_$c")): _*)
    } else {
      val cdf = Sources.snapshotChangesCdf(spark, factPath, rowKey,
        fromV, toV)
      val sign = when(col("change").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      cdf.join(dim, joinKey)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(sign).as("__d_count"),
          sumCols.map(c => sum(sign * col(c)).as(s"__d_$c")): _*)
    }
    val old = Sources.snapshotRead(spark, mvPath, mvV)
    def z(c: org.apache.spark.sql.Column) = coalesce(c, lit(0L))
    val merged = old.join(delta, keyCols, "full_outer")
      .select(keyCols.map(col) ++
        Seq((z(col("mv_count")) + z(col("__d_count"))).as("mv_count")) ++
        sumCols.map(c =>
          (z(col(s"sum_$c")) + z(col(s"__d_$c"))).as(s"sum_$c")): _*)
      .filter(col("mv_count") > 0)
    val newMvV = Sources.snapshotCommit(merged, mvPath, overwrite = true)
    writeJoinAggVersion(spark, mvPath, toV)
    newMvV
  }

  private def writeJoinAggVersion(spark: SparkSession, mvPath: String,
      v: Int): Unit = {
    val st = spark.read.parquet(joinAggState(mvPath)).head
    import spark.implicits._
    Seq((v, st.getAs[String]("key_cols"), st.getAs[String]("sum_cols"),
        st.getAs[String]("row_key"), st.getAs[String]("join_key"),
        st.getAs[String]("dim_path")))
      .toDF("base_version", "key_cols", "sum_cols", "row_key", "join_key",
        "dim_path")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(joinAggState(mvPath))
  }

  // ---- approximate distinct counts: union-closed sketches ----------
  //
  // count(DISTINCT x) is the third canonical MV aggregate class:
  // not abelian (no subtraction), but union-CLOSED — Datasketches HLL
  // registers merge by elementwise max, so APPENDS maintain the view
  // by sketch union over just the new rows (work ∝ appended rows,
  // the streaming-ingest norm). Deletes/updates fall back to
  // affected-group re-aggregation, exactly like min/max. The exact
  // row count rides along abelian (as mv_count) so the view serves
  // both "how many rows" and "how many distinct" per key.

  /** Full-compute a distinct-count-bearing view ((count, HLL sketch of
    * `distinctCol`) per key) and publish it. lgK = 12 → ~1.6% relative
    * standard error, exact below ~2^12 distinct values. */
  def buildDistinct(spark: SparkSession, tablePath: String, mvPath: String,
      rowKey: String, keyCols: Seq[String], distinctCol: String,
      lgK: Int = 12): Int = {
    val v = Sources.snapshotLatestVersion(spark, tablePath)
    require(v > 0, s"no snapshot table at $tablePath")
    val mv = distinctAgg(Sources.snapshotRead(spark, tablePath, v),
      keyCols, distinctCol, lgK)
    val mvv = Sources.snapshotCommit(mv, mvPath, overwrite = true)
    writeState(spark, mvPath, v, keyCols, Seq(distinctCol), rowKey, lgK)
    mvv
  }

  private def distinctAgg(df: DataFrame, keyCols: Seq[String],
      distinctCol: String, lgK: Int): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("mv_count"),
        hll_sketch_agg(col(distinctCol), lit(lgK)).as(s"hll_$distinctCol"))

  /** Refresh a [[buildDistinct]] view. Append-only base history since
    * the last refresh → per-key sketch UNION of the old registers with
    * the new rows' sketch (no base rescan, no diff join); anything
    * else → affected-group re-aggregation (the [[refreshMinMax]]
    * fallback: deletions can remove a distinct value no sketch
    * arithmetic recovers). The sketch width (lgK) is read from the
    * state the build persisted — never a refresh argument, because a
    * mismatched lgConfigK either fails hll_union (append path) or
    * leaves mixed-width registers that break later rollup unions
    * (re-aggregation path). */
  def refreshDistinct(spark: SparkSession, tablePath: String,
      mvPath: String): Int = {
    val st = spark.read.parquet(statePath(mvPath)).head
    val fromV = st.getAs[Int]("base_version")
    val keyCols = st.getAs[String]("key_cols").split(",").toSeq
    val distinctCol = st.getAs[String]("sum_cols")
    val rowKey = st.getAs[String]("row_key")
    val toV = Sources.snapshotLatestVersion(spark, tablePath)
    val mvV = Sources.snapshotLatestVersion(spark, mvPath)
    if (toV == fromV) return mvV
    val hllCol = s"hll_$distinctCol"
    // state files written before r13 carry no lg_k column. 12 was
    // only the DEFAULT then — buildDistinct always took a
    // caller-supplied lgK — so blindly assuming 12 would hand a
    // legacy non-default-width view mismatched registers that
    // hll_union REJECTS at refresh time (differing lgConfigK).
    // Recover the TRUE width from the view's own persisted registers
    // instead: the DataSketches serialization carries lgConfigK in
    // its preamble, so any one stored blob is authoritative. Only an
    // EMPTY legacy view (no groups → no blob to inspect) falls back
    // to the old default, with a logged statement of the assumption.
    val lgK =
      if (st.schema.fieldNames.contains("lg_k")) st.getAs[Int]("lg_k")
      else {
        val blob = Sources.snapshotRead(spark, mvPath, mvV)
          .select(hllCol).filter(col(hllCol).isNotNull).limit(1).collect()
        if (blob.nonEmpty)
          org.apache.datasketches.hll.HllSketch
            .heapify(blob(0).getAs[Array[Byte]](0)).getLgConfigK
        else {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"pre-r13 MV state at $mvPath has no lg_k and no stored " +
              "sketch to read the width from (empty view); assuming " +
              "the legacy default lgK=12")
          12
        }
      }
    val fromSet = commitSet(spark, tablePath, fromV)
    val toSet = commitSet(spark, tablePath, toV)
    val merged = if (fromSet.subsetOf(toSet)) {
      val newDirs = (toSet -- fromSet).toSeq.sorted
        .map(c => Sources.commitDir(tablePath, c))
      if (newDirs.isEmpty) {
        writeState(spark, mvPath, toV, keyCols, Seq(distinctCol), rowKey, lgK)
        return mvV
      }
      val delta = spark.read.parquet(newDirs: _*)
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__d_count"),
          hll_sketch_agg(col(distinctCol), lit(lgK)).as("__d_hll"))
      val old = Sources.snapshotRead(spark, mvPath, mvV)
      old.join(delta, keyCols, "full_outer")
        .select(keyCols.map(col) ++ Seq(
          (coalesce(col("mv_count"), lit(0L)) +
            coalesce(col("__d_count"), lit(0L))).as("mv_count"),
          when(col("__d_hll").isNull, col(hllCol))
            .when(col(hllCol).isNull, col("__d_hll"))
            .otherwise(hll_union(col(hllCol), col("__d_hll"))).as(hllCol)): _*)
    } else {
      val cdf = Sources.snapshotChangesCdf(spark, tablePath, rowKey,
        fromV, toV)
      val affected = graft.Caches.cached(
        cdf.select(keyCols.map(col): _*).distinct())
      val recomputed = distinctAgg(
        Sources.snapshotRead(spark, tablePath, toV)
          .join(affected, keyCols, "left_semi"), keyCols, distinctCol, lgK)
      Sources.snapshotRead(spark, mvPath, mvV)
        .join(affected, keyCols, "left_anti")
        .unionByName(recomputed)
    }
    val newMvV = Sources.snapshotCommit(merged, mvPath, overwrite = true)
    writeState(spark, mvPath, toV, keyCols, Seq(distinctCol), rowKey, lgK)
    newMvV
  }

  /** Refresh a [[buildMinMax]] view: re-aggregate ONLY the groups the
    * CDF touched, carry everything else over. Groups whose rows all
    * left the table leave the view (the re-aggregation simply returns
    * no row for them). */
  def refreshMinMax(spark: SparkSession, tablePath: String,
      mvPath: String): Int = {
    val st = spark.read.parquet(statePath(mvPath)).head
    val fromV = st.getAs[Int]("base_version")
    val keyCols = st.getAs[String]("key_cols").split(",").toSeq
    val valCol = st.getAs[String]("sum_cols")
    val rowKey = st.getAs[String]("row_key")
    val toV = Sources.snapshotLatestVersion(spark, tablePath)
    val mvV = Sources.snapshotLatestVersion(spark, mvPath)
    if (toV == fromV) return mvV
    val cdf = Sources.snapshotChangesCdf(spark, tablePath, rowKey,
      fromV, toV)
    val affected = graft.Caches.cached(
      cdf.select(keyCols.map(col): _*).distinct())
    val recomputed = minMaxAgg(
      Sources.snapshotRead(spark, tablePath, toV)
        .join(affected, keyCols, "left_semi"), keyCols, valCol)
    val carried = Sources.snapshotRead(spark, mvPath, mvV)
      .join(affected, keyCols, "left_anti")
    val newMvV = Sources.snapshotCommit(
      carried.unionByName(recomputed), mvPath, overwrite = true)
    writeState(spark, mvPath, toV, keyCols, Seq(valCol), rowKey)
    newMvV
  }
}
