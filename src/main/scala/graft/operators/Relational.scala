package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composable relational operators covering the reference's surface
  * (SURVEY.md §2.2–2.7): projections/filters (P*), joins (J*),
  * aggregations (A*), sort/limit/dedup (O*), union (U1).
  *
  * Everything here is a declarative `DataFrame => DataFrame` so Catalyst
  * keeps full visibility: predicate pushdown, column pruning, top-k
  * (`TakeOrderedAndProject`), partial aggregation and broadcast-join
  * selection all still apply. No UDFs, no RDDs, no collect().
  */
object Relational {

  /** A2/O4 (goodreads.py:168): group-by count + deterministic top-k.
    * Ties broken by the group keys so results are stable across runs
    * and engines. Catalyst plans the sort+limit as TakeOrderedAndProject
    * (per-partition top-k, merged on the driver) — no global sort. */
  def topKByCount(df: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    val sortCols = col("cnt").desc +: keys.map(col(_).asc)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(sortCols: _*)
      .limit(k)
  }

  /** O2 "keep latest edition per work" (goodreads.py:83) done right:
    * the reference relies on undocumented orderBy+dropDuplicates
    * first-row-wins; the deterministic form is a window row_number.
    * `order` must be a total order within each partition (include a
    * unique tie-break column). */
  def dedupLatest(df: DataFrame, partitionBy: Seq[String], order: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(partitionBy.map(col): _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** J3 (goodreads.py:151): restrict `df` to rows whose key appears in
    * `keep` — expressed honestly as a left-semi join so Catalyst can
    * broadcast the key side when small. */
  def semiRestrict(df: DataFrame, keep: DataFrame, keyCols: Seq[String]): DataFrame =
    df.join(keep, keyCols, "left_semi")

  /** Complement of semiRestrict: rows of `df` with no match in `other`. */
  def antiExclude(df: DataFrame, other: DataFrame, keyCols: Seq[String]): DataFrame =
    df.join(other, keyCols, "left_anti")

  /** U1 (goodreads.py:473–487): tag two frames with a `type`
    * discriminator and union them by name (the reference manually
    * aligns 13 columns positionally; unionByName is the robust form). */
  def unionTagged(a: DataFrame, aTag: String, b: DataFrame, bTag: String): DataFrame =
    a.withColumn("type", lit(aTag))
      .unionByName(b.withColumn("type", lit(bTag)), allowMissingColumns = true)

  /** P3 (goodreads.py:54–57): name of the max-valued column among
    * `fields` — the reference's only Python UDF, re-expressed as pure
    * Catalyst expressions (greatest + first-match when-chain), which
    * keeps whole-stage codegen and removes the Python-worker boundary.
    *
    * Tie-break: FIRST maximum in `fields` order, exactly matching the
    * reference's `list.index(max(...))`. Null fields are treated as
    * smaller than any value (greatest ignores nulls). */
  def argmaxFields(fields: Seq[String]): Column = {
    require(fields.size >= 2, "argmaxFields needs at least 2 columns")
    val m = greatest(fields.map(col): _*)
    fields.tail.foldLeft(when(col(fields.head) === m, lit(fields.head))) {
      (acc, f) => acc.when(col(f) === m, lit(f))
    }
  }

  /** A3 (goodreads.py:94) with deterministic output: collect_set is
    * unordered, so sort the array before returning it. */
  def collectSortedSet(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(array_sort(collect_set(col(valueCol))).as(s"${valueCol}_set"))

  /** Skew-tolerant two-phase aggregation: count + sum per key, with a
    * random salt splitting each hot key across `saltBuckets` reducers
    * before a cheap second phase merges the partials.
    *
    * At 100 TB a handful of hot keys (the reference's book 100001 holds
    * 22 806 of 5.5 M edges) can pin a single reducer; salting bounds
    * any reducer's share of a key to 1/saltBuckets. The salt is
    * internal — results are EXACTLY the plain groupBy's (the DuckDB
    * oracle of q30 proves it), only the shuffle shape changes. AQE's
    * skew handling covers joins; this covers aggregation.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(seed = 7L) * saltBuckets).cast("int"))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum("__cnt").as("cnt"), sum("__sum").as(s"${valueCol}_sum"))
  }

  /** Skew-tolerant salted JOIN — the join-side sibling of
    * [[saltedAggregate]]: a random salt splits every hot key of the
    * BIG side across `saltBuckets` reducers, and the small side is
    * replicated once per bucket (explode over 0..saltBuckets-1) so
    * every salted partition still finds its match. Results are EXACTLY
    * the plain equi-join's (the salt is internal; q42's oracle proves
    * it) — only the shuffle shape changes: no reducer sees more than
    * 1/saltBuckets of any key. Use when the small side is too big to
    * broadcast but the big side's key histogram is spiked; AQE's
    * skew-join split covers sort-merge plans after the fact, salting
    * fixes the layout up front (and composes with pre-aggregation).
    * `keys` must name columns present on BOTH sides. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      (rand(seed = 11L) * saltBuckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Range join: (left, right) pairs sharing `keys` with `rightTs`
    * strictly after `leftTs` and within `window` of it — the
    * time-proximity pairing primitive (q19 is its registered
    * instance). Physical shape: shuffled equi-join on `keys` with a
    * residual range predicate — never a cartesian (PlanSpec-pinned). */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, window: String): DataFrame =
    left.join(right, keys)
      .filter(col(rightTs) > col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"))

  /** As-of join: for every left row, attach the single most recent
    * right row with `rightTs` ≤ `leftTs`, matched on `keys` — the
    * event-attribution / point-in-time-lookup primitive (q20 is its
    * registered instance). `rightTieBreak` names right columns that pin
    * a deterministic winner among equal timestamps (latest-wins, i.e.
    * the lexicographic MAX of (rightTs, tieBreak…) at or before the
    * left row).
    *
    * Physical shape — the part that matters at 100 TB: NOT a join.
    * Both sides are tagged and unioned, then ONE keyed window computes
    * a running `last(right_payload, ignoreNulls)` in (ts, side) order,
    * so each left row reads the nearest preceding right row directly.
    * A join-then-rank form would materialize every (left, earlier
    * right) pair per key before pruning — quadratic per hot key; this
    * form shuffles each input row exactly once and holds O(1) state
    * per row (PlanSpec pins the no-join shape on q20).
    *
    * Left rows with no qualifying right row are dropped (inner as-of).
    * Non-key column names must not collide across sides. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    // Right rows sort BEFORE left rows at the same instant (__side 0<1)
    // so `rightTs == leftTs` matches match (inclusive as-of).
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__r")): _*)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val order = col("__ts").asc +: col("__side").asc +:
      rightTieBreak.map(c => col("__r")(c).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(left.columns.map(col) ++ payload.map(p => col("__m")(p).as(p)): _*)
  }

  /** SCD2 history build: turn a change/version log into slowly-
    * changing-dimension validity intervals — one row per version with
    * `valid_from` = its own version stamp, `valid_to` = the NEXT
    * version's stamp for the same key (null while current), and an
    * `is_current` flag. The standard warehouse shape for "what was
    * this row's value as of date d" joins (compose with [[asofJoin]]
    * to query it). Ties on the version stamp are ordered by
    * `tieBreak`, so the chain is total and deterministic.
    *
    * Scale shape: ONE keyed window (partition by key, lead by version
    * order) — the per-key history sorts independently per partition;
    * never a global sort. */
  def scd2Intervals(df: DataFrame, keys: Seq[String], versionCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (versionCol +: tieBreak).map(c => col(c).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Sweep-line interval aggregation: given one [start, end] DATE
    * interval per row (inclusive), the count of intervals covering
    * each boundary day — "how many items were open/in-transit on day
    * d" (q43 is its registered instance). The naive form is an
    * interval join (every day × every interval — O(rows × days), what
    * q43's oracle deliberately does); the sweep computes the identical
    * step function linearly: +1 at start, −1 at end+1, ONE keyed
    * aggregation by day, then a cumulative sum. The cumulative window
    * is safe at any input scale because it runs over the AGGREGATED
    * date dimension (thousands of rows — bounded by the calendar, not
    * the data); the per-row work all happens in the keyed agg before
    * it. Output: (day, open_cnt) at every step-function breakpoint. */
  def sweepLineCounts(intervals: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    // null start OR end → dropped: an interval missing an endpoint has
    // no defined coverage, and a null boundary would otherwise form a
    // null "day" group that sorts first and offsets every count
    val iv = intervals.filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val deltas = iv
      .select(to_date(col(startCol)).as("day"), lit(1L).as("__d"))
      .unionAll(iv
        .select(date_add(to_date(col(endCol)), 1).as("day"), lit(-1L).as("__d")))
      .groupBy("day").agg(sum("__d").as("__d"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("open_cnt", sum("__d").over(w)).select("day", "open_cnt")
  }
}
