package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Relational

/** Relational query pack over the driver testdata, exercising the
  * reference's relational operator inventory (SURVEY.md §2.1–2.8,
  * §2.13 Q1–Q10 shapes) transplanted onto the star schema.
  *
  * Scale notes (100 TB thinking):
  *  - dimension joins broadcast only the genuinely-fixed-size dims
  *    (region: 5 rows, nation: 25); customer/supplier/part scale with
  *    SF, so those joins are left to Catalyst/AQE (auto-broadcast when
  *    under threshold, sort-merge + skew-split otherwise);
  *  - every top-k is orderBy+limit → TakeOrderedAndProject (per-partition
  *    heap, no global sort);
  *  - group-bys are declarative → partial (map-side) aggregation free;
  *  - filters sit directly on scans → parquet predicate pushdown.
  */
object RelationalQueries {

  private def q(name: String, oracle: String)(run: (SparkSession, String) => DataFrame) =
    NamedQuery(name, run, Some(oracle))

  val all: Seq[NamedQuery] = Seq(

    // ---- A1/A4/A6/P10/P11 (goodreads.py:162 etc.): grouped aggregates,
    // TPC-H Q1 pricing-summary shape: filter → groupBy → 6 aggregates.
    q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- A2/O4 (goodreads.py:168 "top-10 reviewers"): group-count top-k.
    q("q02_top_users_by_events",
      """SELECT user_id, count(*) AS cnt FROM events
        |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin) { (s, dir) =>
      Relational.topKByCount(Tables.events(s, dir), Seq("user_id"), 10)
    },

    // ---- J1/A6 (goodreads.py:81,193): equi-join + per-group stats.
    q("q03_segment_order_stats",
      """SELECT c_mktsegment,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price,
        |  round(avg(o_totalprice), 4) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price"),
          round(avg("o_totalprice"), 4).as("avg_price"))
        .orderBy("c_mktsegment")
    },

    // ---- multi-way star join (J1/J2) with fixed-size dims broadcast.
    q("q04_revenue_by_nation",
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).filter(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // ---- P5/P6/P15 (goodreads.py:84,217): IN-list + LIKE filters,
    // pruned projection straight onto the parquet scan.
    q("q05_parts_filter",
      """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
        |FROM part
        |WHERE p_size IN (1, 5, 10, 15, 20) AND p_type LIKE '%O%'
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_size").isin(1, 5, 10, 15, 20) && col("p_type").like("%O%"))
        .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
        .orderBy("p_partkey")
    },

    // ---- O1/O2 (goodreads.py:83): dedup-latest via window row_number —
    // the deterministic repair of orderBy+dropDuplicates (SURVEY §2.5).
    q("q06_latest_order_per_customer",
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      Relational.dedupLatest(Tables.orders(s, dir), Seq("o_custkey"),
          Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"), col("o_totalprice"))
        .orderBy("o_custkey")
    },

    // ---- A5/A9 (goodreads.py:200,599): count(distinct) per group.
    q("q07_segment_nation_diversity",
      """SELECT c_mktsegment,
        |  count(DISTINCT c_nationkey) AS n_nations,
        |  count(*) AS n_customers,
        |  round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(
          countDistinct("c_nationkey").as("n_nations"),
          count(lit(1)).as("n_customers"),
          round(avg("c_acctbal"), 4).as("avg_bal"))
        .orderBy("c_mktsegment")
    },

    // ---- A3 (goodreads.py:94 collect_set "to_read"): set-valued agg,
    // sorted + joined to a string for deterministic, engine-neutral output.
    q("q08_user_event_types",
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          array_join(array_sort(collect_set("event_type")), ",").as("event_types"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // ---- U1/P12/O3 (goodreads.py:473–487): tagged union + distinct,
    // the vertex-table construction pattern.
    q("q09_all_parties",
      """SELECT * FROM (
        |  SELECT c_custkey AS id, c_name AS name, 'Customer' AS type FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS id, s_name AS name, 'Supplier' AS type FROM supplier)
        |ORDER BY type, id""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey").as("id"), col("c_name").as("name"))
      val sup = Tables.supplier(s, dir).select(col("s_suppkey").as("id"), col("s_name").as("name"))
      Relational.unionTagged(c, "Customer", sup, "Supplier").orderBy("type", "id")
    },

    // ---- J3 (goodreads.py:151): semi-join restriction.
    q("q10_customers_with_big_orders",
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val big = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("c_custkey"))
      Relational.semiRestrict(Tables.customer(s, dir), big, Seq("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // ---- anti-join: rows with no match (completes the semi/anti pair).
    q("q11_parts_no_big_shipments",
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Relational.antiExclude(Tables.part(s, dir),
          Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
            .select(col("l_partkey").as("p_partkey")), Seq("p_partkey"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // ---- window functions (SURVEY §2.5): rank per partition, top-3.
    q("q12_top3_orders_per_customer",
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")
    },

    // ---- P3 (goodreads.py:54–57 argmax-over-columns, the reference's
    // only Python UDF) as pure Catalyst expressions over a pivot.
    q("q13_part_dominant_returnflag",
      """SELECT l_partkey,
        |  count(*) FILTER (WHERE l_returnflag = 'A') AS cnt_a,
        |  count(*) FILTER (WHERE l_returnflag = 'N') AS cnt_n,
        |  count(*) FILTER (WHERE l_returnflag = 'R') AS cnt_r,
        |  CASE WHEN count(*) FILTER (WHERE l_returnflag = 'A') >=
        |            count(*) FILTER (WHERE l_returnflag = 'N')
        |        AND count(*) FILTER (WHERE l_returnflag = 'A') >=
        |            count(*) FILTER (WHERE l_returnflag = 'R') THEN 'cnt_a'
        |       WHEN count(*) FILTER (WHERE l_returnflag = 'N') >=
        |            count(*) FILTER (WHERE l_returnflag = 'R') THEN 'cnt_n'
        |       ELSE 'cnt_r' END AS top_flag
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(
          count(when(col("l_returnflag") === "A", 1)).as("cnt_a"),
          count(when(col("l_returnflag") === "N", 1)).as("cnt_n"),
          count(when(col("l_returnflag") === "R", 1)).as("cnt_r"))
        .withColumn("top_flag", Relational.argmaxFields(Seq("cnt_a", "cnt_n", "cnt_r")))
        .orderBy("l_partkey")
    },

    // ---- P9/P13/P15 (goodreads.py:99,217): split → array → index, LIKE.
    q("q14_part_name_tokens",
      """SELECT p_partkey, p_name,
        |  string_split(p_name, ' ')[1] AS name_head,
        |  len(string_split(p_name, ' ')) AS n_tokens,
        |  upper(p_brand) AS brand_uc
        |FROM part WHERE p_name LIKE '%gear%' ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"), col("p_name"),
          split(col("p_name"), " ").getItem(0).as("name_head"),
          size(split(col("p_name"), " ")).as("n_tokens"),
          upper(col("p_brand")).as("brand_uc"))
        .orderBy("p_partkey")
    },

    // ---- time-bucketed aggregation over events (batch form of the
    // streaming windowed agg; ns timestamps normalized in Tables.events).
    q("q15_hourly_event_stats",
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
        |  count(*) AS cnt, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
        .orderBy("hour", "event_type")
    },

    // ---- P7 (goodreads.py:146 point lookups): key filter + join + agg.
    q("q16_order_lookup",
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  count(*) AS n_lines, round(sum(l_extendedprice), 2) AS line_total
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (1, 7, 42)
        |GROUP BY o_orderkey, o_orderstatus, o_totalprice
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderkey").isin(1, 7, 42))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderstatus", "o_totalprice")
        .agg(count(lit(1)).as("n_lines"), round(sum("l_extendedprice"), 2).as("line_total"))
        .orderBy("o_orderkey")
    }
  )
}
