package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second relational pack: operators beyond the reference's own surface
  * that any serious Spark analytics engine must cover — time-bucketed
  * (tumbling-window) aggregation, ROLLUP, range joins, as-of joins,
  * exact percentiles, lead/lag windows, generators (posexplode), pivot,
  * and set operations. Every query is DuckDB-oracle-backed.
  *
  * Scale notes:
  *  - the range/as-of joins key on an equi column (user_id) FIRST, so
  *    the physical plan is a shuffled equi-join with a residual range
  *    predicate — never a cartesian;
  *  - tumbling windows are `window(ts, ...)` — identical code path
  *    batch and streaming (graft.streaming reuses it);
  *  - pivot uses an explicit value list (no extra distinct-values job).
  */
object AdvancedQueries {

  private def q(name: String, oracle: String)(run: (SparkSession, String) => DataFrame) =
    NamedQuery(name, run, Some(oracle))

  val all: Seq[NamedQuery] = Seq(

    // ---- tumbling 6-hour windows over events (batch form; the same
    // window() op drives the streaming facade).
    q("q17_tumbling_windows",
      """SELECT strftime(make_timestamp((epoch_us(ts) // 21600000000) * 21600000000),
        |                '%Y-%m-%d %H:%M') AS win_start,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("win_start"),
          col("event_type"), col("cnt"), col("total_value"))
        .orderBy("win_start", "event_type")
    },

    // ---- ROLLUP region → nation → grand total (hierarchical subtotals).
    q("q18_rollup_revenue",
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        // Column-args rollup: the String-varargs overload resolves
        // through dataset-tagged attributes and falsely trips
        // DetectAmbiguousSelfJoin when a join sits upstream
        .rollup(col("r_name").as("rn"), col("n_name").as("nn"))
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .select(coalesce(col("rn"), lit("ALL")).as("region"),
          coalesce(col("nn"), lit("ALL")).as("nation"),
          col("revenue"), col("n_orders"))
        .orderBy("region", "nation")
    },

    // ---- range join: per user, pairs of events within a 10-minute
    // window. Equi key (user_id) first → shuffled equi-join with a
    // residual range predicate, not a cartesian.
    q("q19_event_pairs_10min",
      """SELECT a.user_id AS user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).select("user_id", "ts")
      graft.operators.Relational.rangeJoin(
          e.toDF("user_id", "a_ts"), e.toDF("user_id", "b_ts"),
          Seq("user_id"), leftTs = "a_ts", rightTs = "b_ts",
          window = "10 MINUTE")
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },

    // ---- as-of join: for each purchase event, the latest click of the
    // same user at-or-before the purchase (attribution). Window-rank
    // formulation — deterministic tie-break (ts desc, id desc), unlike
    // a bare ASOF join over tied timestamps.
    q("q20_purchase_attribution",
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |     j AS (SELECT purchase_id, p.user_id, click_id,
        |             epoch_us(c_ts) AS click_us,
        |             row_number() OVER (PARTITION BY purchase_id
        |               ORDER BY c_ts DESC, click_id DESC) AS rn
        |           FROM p JOIN c ON p.user_id = c.user_id AND c.c_ts <= p.p_ts)
        |SELECT purchase_id, user_id, click_id, click_us
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      graft.operators.Relational.asofJoin(p, c, Seq("user_id"),
          leftTs = "p_ts", rightTs = "c_ts", rightTieBreak = Seq("click_id"))
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          unix_micros(col("c_ts")).as("click_us"))
        .orderBy("purchase_id")
    },

    // ---- exact interpolated percentiles per group (both engines use
    // the same linear-interpolation definition).
    q("q21_balance_percentiles",
      """SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
        |  round(quantile_cont(c_acctbal, 0.50), 4) AS p50,
        |  round(quantile_cont(c_acctbal, 0.90), 4) AS p90,
        |  count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(
          round(percentile(col("c_acctbal"), lit(0.25)), 4).as("p25"),
          round(percentile(col("c_acctbal"), lit(0.50)), 4).as("p50"),
          round(percentile(col("c_acctbal"), lit(0.90)), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // ---- lead/lag: inter-event gap stats per user (sessionization's
    // batch sibling; gap in exact microseconds).
    q("q22_event_gap_stats",
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id, count(gap_us) AS n_gaps,
        |  round(avg(gap_us), 2) AS avg_gap_us, max(gap_us) AS max_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          round(avg("gap_us"), 2).as("avg_gap_us"),
          max("gap_us").as("max_gap_us"))
        .orderBy("user_id")
    },

    // ---- generator: posexplode of the part-name token array.
    q("q23_part_name_explode",
      """WITH toks AS (SELECT p_partkey, string_split(p_name, ' ') AS ts
        |              FROM part WHERE p_partkey < 100)
        |SELECT p_partkey, u.i - 1 AS pos, ts[u.i] AS token
        |FROM toks CROSS JOIN LATERAL (
        |  SELECT unnest(generate_series(1, len(ts))) AS i) u
        |ORDER BY p_partkey, pos""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "token")))
        .orderBy("p_partkey", "pos")
    },

    // ---- pivot with an explicit value list (no distinct-values job).
    q("q24_user_event_pivot",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    },

    // ---- GROUPING SETS with grouping_id: per-segment and per-nation
    // totals in one pass (independent subtotals, unlike ROLLUP's
    // hierarchy).
    q("q31_grouping_sets",
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |  coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
        |  count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        |ORDER BY segment, nation""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey"))),
          col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total_bal"))
        .select(
          coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          coalesce(col("c_nationkey").cast("string"), lit("ALL")).as("nation"),
          col("n"), col("total_bal"))
        .orderBy("segment", "nation")
    },

    // ---- batch sessionization: session_window vs the classic
    // gaps-and-islands SQL (lag + running flag sum) — same sessions,
    // independently derived.
    q("q32_user_sessions",
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, min(epoch_us(ts)) AS session_start_us,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
        .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start_us")
    },

    // ---- set op: customers ordering in BOTH 1995 and 1998 (INTERSECT).
    q("q25_custkeys_both_years",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        .intersect(o.filter(year(col("o_orderdate")) === 1998).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- JSON scalar extraction from the events props column.
    q("q27_props_json_stats",
      """SELECT event_type,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(round(avg("k"), 4).as("avg_k"), max("k").as("max_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ---- date_trunc + window: month-over-month revenue delta.
    q("q28_monthly_revenue_delta",
      """WITH m AS (
        |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |         round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue,
        |  round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS delta
        |FROM m ORDER BY month""".stripMargin) { (s, dir) =>
      val w = Window.orderBy("month")
      Tables.orders(s, dir)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(round(sum("o_totalprice"), 2).as("revenue"))
        .withColumn("delta", round(col("revenue") - lag("revenue", 1).over(w), 2))
        .orderBy("month")
    },

    // ---- custom typed Aggregator (UDAF): per-priority geometric mean
    // of order totals — partial-aggregating like any built-in.
    q("q29_geomean_by_priority",
      """SELECT o_orderpriority,
        |  round(exp(avg(ln(o_totalprice))), 4) AS geomean, count(*) AS n
        |FROM orders WHERE o_totalprice > 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val geomean = udaf(graft.functions.GeoMean, org.apache.spark.sql.Encoders.scalaDouble)
      Tables.orders(s, dir)
        .filter(col("o_totalprice") > 0)
        .groupBy("o_orderpriority")
        .agg(round(geomean(col("o_totalprice")), 4).as("geomean"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // ---- skew-tolerant salted aggregation: identical results to the
    // plain GROUP BY (that's the point — the oracle proves it), but the
    // shuffle splits hot keys across reducers.
    q("q30_salted_supplier_volume",
      """SELECT l_suppkey, count(*) AS cnt,
        |  round(sum(l_quantity), 2) AS l_quantity_sum
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      graft.operators.Relational
        .saltedAggregate(Tables.lineitem(s, dir), Seq("l_suppkey"), "l_quantity")
        .select(col("l_suppkey"), col("cnt"),
          round(col("l_quantity_sum"), 2).as("l_quantity_sum"))
        .orderBy("l_suppkey")
    },

    // ---- HLL sketch with a tolerance-bound oracle: the approx value
    // itself is Spark-internal, but exact count + a within-5% flag ARE
    // oracle constants — the sketch family's hash-checkable row
    // (PlanSpec covers the tighter 5% band empirically).
    q("q33_approx_distinct_bound",
      """SELECT count(DISTINCT user_id) AS exact_users, TRUE AS approx_within_5pct
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .agg(countDistinct("user_id").as("exact_users"),
          approx_count_distinct("user_id").as("approx"))
        .select(col("exact_users"),
          (abs(col("approx") - col("exact_users")).cast("double") / col("exact_users")
            <= 0.05).as("approx_within_5pct"))
    },

    // ---- approx percentile sketch (t-digest-family) with the q33
    // tolerance-bound pattern: exact quantiles checked cross-engine,
    // the sketch asserted within 1% relative error Spark-side.
    q("q36_approx_quantile_bound",
      """SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
        |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM lineitem""".stripMargin) { (s, dir) =>
      def ok(i: Int) =
        (abs(element_at(col("ap"), i) - element_at(col("ex"), i))
          / element_at(col("ex"), i) <= 0.01)
      Tables.lineitem(s, dir)
        .agg(
          expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("ex"),
          expr("percentile_approx(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)")
            .as("ap"))
        .select(
          round(element_at(col("ex"), 1), 4).as("p50_exact"),
          round(element_at(col("ex"), 2), 4).as("p90_exact"),
          round(element_at(col("ex"), 3), 4).as("p99_exact"),
          ok(1).as("p50_ok"), ok(2).as("p90_ok"), ok(3).as("p99_ok"))
    },

    // ---- EP2 SQL entry under the oracle gate: the engine executes a
    // SQL STRING over registered temp views (the reference's %sql
    // cells), not a DataFrame chain — parser → analyzer → same plan.
    q("q38_sql_entry_revenue",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_sqlentry")
      s.sql("""SELECT l_returnflag, l_linestatus,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        count(*) AS n_items
        FROM lineitem_sqlentry GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    },

    // ---- ntile quartiles: the ranking-window form (rank/row_number/
    // lag/cumsum are covered; ntile's uneven-bucket arithmetic is its
    // own semantics).
    q("q39_balance_quartiles",
      """SELECT c_mktsegment, q, count(*) AS n,
        |  round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
        |FROM (SELECT c_mktsegment, c_acctbal,
        |        ntile(4) OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS q
        |      FROM customer)
        |GROUP BY 1, 2 ORDER BY c_mktsegment, q""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.customer(s, dir)
        .withColumn("q", ntile(4).over(Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal"), col("c_custkey"))))
        .groupBy("c_mktsegment", "q")
        .agg(count(lit(1)).as("n"), round(min("c_acctbal"), 2).as("min_bal"),
          round(max("c_acctbal"), 2).as("max_bal"))
        .orderBy("c_mktsegment", "q")
    },

    // ---- CUBE: all four grouping combinations in one pass — completes
    // the multi-grouping family (q18 ROLLUP, q31 GROUPING SETS).
    q("q37_cube_quantity",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS n_items
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n_items"))
        .orderBy("returnflag", "linestatus")
    },

    // ---- running (cumulative) aggregation: per-nation monthly revenue
    // with a ROWS UNBOUNDED PRECEDING frame — the window-frame form the
    // other window queries (rank/lag/top-k) don't exercise.
    q("q35_cumulative_revenue",
      """WITH m AS (
        |  SELECT n_name, strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |    round(sum(o_totalprice), 2) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, month, revenue,
        |  round(sum(revenue) OVER (PARTITION BY n_name ORDER BY month
        |    ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue
        |FROM m ORDER BY n_name, month""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("n_name").orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(round(sum("o_totalprice"), 2).as("revenue"))
        .withColumn("cum_revenue", round(sum("revenue").over(w), 2))
        .orderBy("n_name", "month")
    },

    // ---- ANALYZE-style profiling: per-column null/distinct/min/max
    // over documents in one aggregation pass (ingest QA).
    q("q34_profile_documents", {
      val cols = Seq("doc_id", "lang", "n_chars", "source")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str FROM documents""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }) { (s, dir) =>
      graft.operators.Profiling.profile(Tables.documents(s, dir),
          Seq("doc_id", "lang", "n_chars", "source"))
        .orderBy("col_name")
    },

    // ---- P2/P16 (goodreads.py:52 na.fill, :423 dropna) under the
    // oracle: nulls planted deterministically by key, repaired with the
    // real DataFrameNaFunctions API (fill for the numeric, drop on the
    // group key), then aggregated — COALESCE / IS NOT NULL on the
    // oracle side. Both repairs are scan-stage projections (no shuffle
    // beyond the final groupBy).
    q("q41_null_repair",
      """WITH planted AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal,
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg
        |  FROM customer),
        |repaired AS (
        |  SELECT c_custkey, coalesce(bal, 0.0) AS bal, seg
        |  FROM planted WHERE seg IS NOT NULL)
        |SELECT seg, count(*) AS n_rows, round(sum(bal), 2) AS sum_bal
        |FROM repaired GROUP BY seg ORDER BY seg""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal")).as("bal"),
          when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_mktsegment")).as("seg"))
        .na.fill(0.0, Seq("bal"))
        .na.drop(Seq("seg"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_rows"), round(sum("bal"), 2).as("sum_bal"))
        .orderBy("seg")
    },

    // ---- skew-tolerant salted JOIN (join-side sibling of q30's
    // salted aggregation): lineitem ⋈ orders with the big side salted
    // into 16 buckets and the small side replicated per bucket — the
    // salt is internal, so the oracle's PLAIN join must match exactly.
    q("q42_salted_join_revenue",
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      graft.operators.Relational.saltedJoin(
          Tables.lineitem(s, dir)
            .select("l_orderkey", "l_extendedprice", "l_discount"),
          Tables.orders(s, dir)
            .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
          keys = Seq("l_orderkey"), saltBuckets = 16)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("o_orderpriority")
    },

    // ---- sweep-line interval coverage: open orders per boundary day
    // over a deterministic synthetic fulfillment window
    // [o_orderdate, o_orderdate + o_orderkey%90 days]. The engine runs
    // the LINEAR sweep (+1/−1 deltas, one keyed agg, cumulative sum
    // over the calendar-bounded date dimension); the oracle
    // deliberately does the NAIVE boundary-day × interval join — an
    // independent computation of the same step function. Null starts
    // are planted (o_orderkey%97=0) to pin the operator's null guard
    // against the oracle's explicit WHERE.
    q("q43_open_order_days",
      """WITH iv AS (
        |  SELECT CAST(o_orderdate AS DATE) AS s,
        |         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 90 AS INTEGER) AS e
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |bnd AS (SELECT s AS day FROM iv UNION SELECT e + 1 FROM iv)
        |SELECT b.day AS day, CAST(count(iv.s) AS BIGINT) AS open_cnt
        |FROM bnd b LEFT JOIN iv ON iv.s <= b.day AND b.day <= iv.e
        |GROUP BY b.day ORDER BY day""".stripMargin) { (s, dir) =>
      val iv = Tables.orders(s, dir).select(
        when(col("o_orderkey") % 97 === 0, lit(null))
          .otherwise(to_date(col("o_orderdate"))).as("s"),
        date_add(to_date(col("o_orderdate")),
          (col("o_orderkey") % 90).cast("int")).as("e"))
      graft.operators.Relational.sweepLineCounts(iv, "s", "e").orderBy("day")
    },

    // ---- SCD2 history build: each customer's order log becomes
    // validity intervals (valid_from = own date, valid_to = next
    // order's date, open while current) — the warehouse dimension
    // shape an asofJoin then queries. ONE keyed window per customer,
    // never a global sort.
    q("q44_scd2_order_history",
      """SELECT o_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS valid_from,
        |  CAST(lead(o_orderdate) OVER w AS DATE) AS valid_to,
        |  CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_current,
        |  o_totalprice
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      graft.operators.Relational.scd2Intervals(Tables.orders(s, dir),
          keys = Seq("o_custkey"), versionCol = "o_orderdate",
          tieBreak = Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          col("valid_from").cast("date").as("valid_from"),
          col("valid_to").cast("date").as("valid_to"),
          col("is_current").cast("long").as("is_current"),
          col("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- ordered conversion funnel: view → first click AFTER the
    // first view → first purchase AFTER that click, per user. Each
    // stage is one user-keyed min-aggregate joined to the previous
    // stage's table (users-sized, broadcastable) — the subsequence
    // match never windows over the raw event stream.
    q("q45_conversion_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |     c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |           JOIN v ON e.user_id = v.user_id
        |           WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |           GROUP BY e.user_id),
        |     p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |           JOIN c ON e.user_id = c.user_id
        |           WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |           GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_no, 'view' AS stage,
        |         (SELECT count(*) FROM v) AS n_users
        |  UNION ALL SELECT 2, 'click_after_view', (SELECT count(*) FROM c)
        |  UNION ALL SELECT 3, 'purchase_after_click', (SELECT count(*) FROM p))
        |ORDER BY stage_no""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("v_ts"))
        .groupBy("user_id").agg(min("ts").as("c_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("c_ts"))
        .groupBy("user_id").agg(min("ts").as("p_ts"))
      def stage(no: Int, name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(no.toLong).as("stage_no"), lit(name).as("stage"),
            col("n_users"))
      stage(1, "view", v)
        .unionByName(stage(2, "click_after_view", c))
        .unionByName(stage(3, "purchase_after_click", p))
        .orderBy("stage_no")
    },

    // ---- calendar gap-fill + LOCF forward-fill (q46): per-nation
    // daily revenue with missing days materialized and filled from the
    // last observed day — the time-series repair every feature/metric
    // pipeline runs before a rolling computation. Scale shape: the
    // calendar explode is per-key bounded by that key's own date span
    // (never a global calendar cross-join), and the fill is ONE keyed
    // window pass (running last-non-null) — no self-join, no sort
    // beyond the per-nation window. is_gap keeps filled rows auditable.
    q("q46_gapfill_locf",
      """WITH daily AS (
        |  SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS d,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |span AS (SELECT nation, min(d) AS d0, max(d) AS d1
        |         FROM daily GROUP BY nation),
        |cal AS (SELECT nation,
        |          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        |        FROM span),
        |j AS (SELECT c.nation, c.d, daily.rev
        |      FROM cal c LEFT JOIN daily ON daily.nation = c.nation
        |                                AND daily.d = c.d)
        |SELECT nation, strftime(d, '%Y-%m-%d') AS day,
        |  last_value(rev IGNORE NULLS) OVER (PARTITION BY nation ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_rev,
        |  rev IS NULL AS is_gap
        |FROM j ORDER BY nation, day""".stripMargin) { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          to_date(col("o_orderdate")).as("d"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
      val cal = daily.groupBy("nation")
        .agg(min("d").as("d0"), max("d").as("d1"))
        .select(col("nation"),
          explode(sequence(col("d0"), col("d1"),
            expr("interval 1 day"))).as("d"))
      val w = Window.partitionBy("nation").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(daily, Seq("nation", "d"), "left")
        .select(col("nation"), date_format(col("d"), "yyyy-MM-dd").as("day"),
          last(col("rev"), ignoreNulls = true).over(w).as("filled_rev"),
          col("rev").isNull.as("is_gap"))
        .orderBy("nation", "day")
    },

    // ---- trailing time-RANGE window features (q47): per customer, the
    // count/revenue of their orders in the 90 days STRICTLY BEFORE each
    // order (frame [-90, -1] on the day number — same-day peers and the
    // row itself excluded, so the feature is leakage-free at day
    // grain). ONE keyed range-window pass: partitions sort per customer
    // only; at 100 TB this is the shape that replaces the classic
    // self-join-on-inequality, which would re-pair every hot customer's
    // orders quadratically.
    q("q47_rolling_features",
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |    CAST(o_orderdate AS DATE) AS d,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dayn,
        |    o_totalprice FROM orders)
        |SELECT o_custkey, o_orderkey, strftime(d, '%Y-%m-%d') AS day,
        |  count(o_totalprice) OVER w AS n_prev90,
        |  round(coalesce(sum(o_totalprice) OVER w, 0), 2) AS rev_prev90
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY dayn
        |             RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
        .withColumn("dayn", datediff(col("d"), lit("1970-01-01").cast("date")))
      val w = Window.partitionBy("o_custkey").orderBy("dayn")
        .rangeBetween(-90, -1)
      o.select(col("o_custkey"), col("o_orderkey"),
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          count(col("o_totalprice")).over(w).as("n_prev90"),
          round(coalesce(sum(col("o_totalprice")).over(w), lit(0.0)), 2)
            .as("rev_prev90"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- point-in-time training-set assembly (q48): the feature-store
    // correctness op. Labels = orders from 1999 on; features = the
    // customer's running (order count, lifetime value) versioned by
    // order date; each label joins the feature row AS OF the day BEFORE
    // the label (strictly-prior history — the label order itself and
    // same-day activity can never leak into its own features). Built on
    // the engine's union+window asofJoin: each input row shuffles ONCE
    // on the customer key, no inequality join, no per-label re-scan of
    // history. Labels whose customer has no prior history drop (inner
    // as-of): a feature vector of "nothing yet" is not a training row.
    q("q48_pit_training_features", pitFeaturesOracle) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val histW = Window.partitionBy("o_custkey")
        .orderBy(col("fday"), col("fkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val feat = o.select(col("o_custkey"), col("o_orderkey").as("fkey"),
          to_date(col("o_orderdate")).as("fday"), col("o_totalprice"))
        .select(col("o_custkey"), col("fkey"), col("fday"),
          count(lit(1)).over(histW).as("n_prev_orders"),
          round(sum(col("o_totalprice")).over(histW), 2).as("prev_ltv"))
      val labels = o.filter(year(col("o_orderdate")) >= 1999)
        .select(col("o_orderkey").as("label_key"), col("o_custkey"),
          to_date(col("o_orderdate")).as("lday"),
          col("o_totalprice").as("label_price"))
        .withColumn("asof_day", date_sub(col("lday"), 1))
      graft.operators.Relational.asofJoin(labels, feat,
          keys = Seq("o_custkey"), leftTs = "asof_day", rightTs = "fday",
          rightTieBreak = Seq("fkey"))
        .select(col("label_key"), col("o_custkey"),
          date_format(col("lday"), "yyyy-MM-dd").as("day"),
          col("label_price"), col("n_prev_orders"), col("prev_ltv"))
        .orderBy("label_key")
    },

    // ---- END-TO-END feature pipeline (q49): raw tables → model-ready
    // training rows in ONE Catalyst plan, every transform served from a
    // FROZEN artifact — the feature-engineering analog of p19's
    // curation composition. Chain: q48's point-in-time assembly
    // (strictly-prior history, no leakage) → target standardized from
    // the m20 scaler artifact (fit on the train slice only) → price
    // bucketed from the m22 quantile-bin artifact. Both artifacts fold
    // into the projection as constants (no joins added); the oracle
    // chains the PIT CTEs through the scaler moments and the ranked
    // bin edges.
    q("q49_feature_pipeline", featurePipelineOracle) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val train = o.filter(col("o_orderkey") % 5 =!= 0)
      val spath = graft.ScratchDirs.scratch("fp_scaler")
      val bpath = graft.ScratchDirs.scratch("fp_bins")
      graft.Fs.deleteRecursive(s, spath)
      graft.Fs.deleteRecursive(s, bpath)
      graft.ml.FeatureScaler.writeScaler(train,
        Seq("price" -> round(col("o_totalprice") * 100, 0)), spath)
      graft.ml.QuantileBins.writeBins(train,
        col("o_totalprice"), col("o_orderkey"), bins = 8, bpath)
      val histW = Window.partitionBy("o_custkey")
        .orderBy(col("fday"), col("fkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val feat = o.select(col("o_custkey"), col("o_orderkey").as("fkey"),
          to_date(col("o_orderdate")).as("fday"), col("o_totalprice"))
        .select(col("o_custkey"), col("fkey"), col("fday"),
          count(lit(1)).over(histW).as("n_prev_orders"),
          round(sum(col("o_totalprice")).over(histW), 2).as("prev_ltv"))
      val labels = o.filter(year(col("o_orderdate")) >= 1999)
        .select(col("o_orderkey").as("label_key"), col("o_custkey"),
          to_date(col("o_orderdate")).as("lday"),
          col("o_totalprice").as("label_price"))
        .withColumn("asof_day", date_sub(col("lday"), 1))
      val pit = graft.operators.Relational.asofJoin(labels, feat,
          keys = Seq("o_custkey"), leftTs = "asof_day", rightTs = "fday",
          rightTieBreak = Seq("fkey"))
        .select(col("label_key"), col("o_custkey"),
          date_format(col("lday"), "yyyy-MM-dd").as("day"),
          col("label_price"), col("n_prev_orders"), col("prev_ltv"))
      graft.ml.FeatureScaler.zscore(pit,
          Seq("price" -> round(col("label_price") * 100, 0)), spath,
          keep = Seq("label_key", "o_custkey", "day", "label_price",
            "n_prev_orders", "prev_ltv"))
        .withColumn("price_bin",
          graft.ml.QuantileBins.binColumn(s, bpath, col("label_price")))
        .orderBy("label_key")
    },

    // ---- set op: 1995 customers who never ordered again (EXCEPT).
    q("q26_custkeys_churned",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) > 1995
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        .except(o.filter(year(col("o_orderdate")) > 1995).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- SESSION-CATALOG round-trip (EP2 fidelity): the reference's
    // %sql cells resolve tables the catalog populated by saveAsTable
    // (goodreads.py:121–129 writes, :168 queries) — NOT temp views
    // (q38 covers those). This gate does the full path: curate →
    // saveAsTable → `spark.sql` over the CATALOG relation. PlanSpec
    // pins that the catalog read plans the same pushed-filter parquet
    // scan as a path read — the catalog is a name layer, not a
    // different execution path.
    q("q50_catalog_roundtrip",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) => {
        // a FRESH session's in-memory catalog doesn't know the table,
        // but a prior process may have left its warehouse dir — drop
        // both, or saveAsTable fails with LOCATION_ALREADY_EXISTS
        s.sql("DROP TABLE IF EXISTS graft_q50_orders_f")
        graft.Fs.deleteRecursive(s,
          s.conf.get("spark.sql.warehouse.dir") + "/graft_q50_orders_f")
        graft.sources.Sources.saveTable(
          Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
          "graft_q50_orders_f")
        s.sql("""SELECT o_orderpriority, count(*) AS n_orders,
          round(sum(o_totalprice), 2) AS revenue
          FROM graft_q50_orders_f
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      }
    }
  )

  /** Shared oracle for the point-in-time feature assembly: q48 (batch
    * union+window asof) and sw32 (streaming broadcast array lookup)
    * must produce the identical training set. */
  private[queries] def pitFeaturesOracle: String =
    """WITH feat AS (
      |  SELECT o_custkey AS k, o_orderkey AS fkey,
      |    CAST(o_orderdate AS DATE) AS fday,
      |    count(*) OVER w AS n_prev_orders,
      |    round(sum(o_totalprice) OVER w, 2) AS prev_ltv
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |lab AS (SELECT o_orderkey AS label_key, o_custkey AS k,
      |    CAST(o_orderdate AS DATE) AS lday, o_totalprice AS label_price
      |  FROM orders WHERE year(o_orderdate) >= 1999),
      |j AS (SELECT l.label_key, l.k, l.lday, l.label_price,
      |    f.n_prev_orders, f.prev_ltv,
      |    row_number() OVER (PARTITION BY l.label_key
      |      ORDER BY f.fday DESC, f.fkey DESC) AS rn
      |  FROM lab l JOIN feat f
      |    ON f.k = l.k AND f.fday <= l.lday - INTERVAL 1 DAY)
      |SELECT label_key, k AS o_custkey, strftime(lday, '%Y-%m-%d') AS day,
      |  label_price, n_prev_orders, prev_ltv
      |FROM j WHERE rn = 1 ORDER BY label_key""".stripMargin

  /** Oracle for q49: the PIT CTEs chained through the scaler moments
    * (exact integer space, the m20 convention) and the ranked quantile
    * edges (the m22 convention). */
  private def featurePipelineOracle: String = {
    val pitCtes = pitFeaturesOracle.substring(0,
      pitFeaturesOracle.indexOf("\nSELECT label_key"))
    s"""$pitCtes,
       |pit AS (SELECT label_key, k AS o_custkey,
       |    strftime(lday, '%Y-%m-%d') AS day,
       |    label_price, n_prev_orders, prev_ltv
       |  FROM j WHERE rn = 1),
       |sct AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS p
       |  FROM orders WHERE o_orderkey % 5 <> 0),
       |scm AS (SELECT count(*) AS n, sum(p) AS sp, sum(p*p) AS spp FROM sct),
       |btr AS (SELECT o_totalprice AS v,
       |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS r
       |  FROM orders WHERE o_orderkey % 5 <> 0),
       |bn AS (SELECT count(*) AS n FROM btr),
       |bpos AS (SELECT (bn.n * g.k) // 8 AS p
       |  FROM generate_series(1, 7) g(k) CROSS JOIN bn),
       |be AS (SELECT btr.v AS edge FROM bpos JOIN btr ON btr.r = bpos.p)
       |SELECT label_key, o_custkey, day, label_price, n_prev_orders,
       |  prev_ltv,
       |  round((CAST(round(label_price * 100, 0) AS BIGINT)
       |      - CAST(sp AS DOUBLE)/scm.n)
       |    / sqrt(CAST(spp AS DOUBLE)/scm.n
       |           - (CAST(sp AS DOUBLE)/scm.n)*(CAST(sp AS DOUBLE)/scm.n)), 4)
       |    + 0.0 AS z_price,
       |  CAST((SELECT count(*) FROM be WHERE label_price >= edge) AS INT)
       |    AS price_bin
       |FROM pit CROSS JOIN scm ORDER BY label_key""".stripMargin
  }
}
