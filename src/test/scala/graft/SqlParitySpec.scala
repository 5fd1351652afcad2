package graft

import graft.queries.RelationalQueries

/** EP1/EP2 parity (SURVEY §3): the SQL entry point over registered
  * views must produce byte-identical results to the Dataset API — both
  * are fronts for the same Catalyst plans. */
class SqlParitySpec extends SparkSpec {

  private def viaSql(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).toSeq

  private def viaDataset(name: String): Seq[String] =
    RelationalQueries.all.find(_.name == name).get
      .run(spark, sf).collect().map(_.toString).toSeq

  test("SQL text and Dataset API produce identical rows for declared queries") {
    Tables.registerAll(spark, sf)
    // DuckDB-dialect oracles that are also valid Spark SQL
    val sparkSqlTwins = Map(
      "q02_top_users_by_events" ->
        """SELECT user_id, count(*) AS cnt FROM events
          |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin,
      "q03_segment_order_stats" ->
        """SELECT c_mktsegment, count(*) AS n_orders,
          |  round(sum(o_totalprice), 2) AS total_price,
          |  round(avg(o_totalprice), 4) AS avg_price
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q07_segment_nation_diversity" ->
        """SELECT c_mktsegment,
          |  count(DISTINCT c_nationkey) AS n_nations,
          |  count(*) AS n_customers,
          |  round(avg(c_acctbal), 4) AS avg_bal
          |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    sparkSqlTwins.foreach { case (name, sql) =>
      assert(viaSql(sql) === viaDataset(name), s"EP1/EP2 divergence in $name")
    }
  }

  test("GraftExtensions injects float_dot into a fresh session's SQL surface") {
    import org.apache.spark.sql.SparkSession
    val orig = spark // keep the shared session restorable
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session over the SAME SparkContext, extensions applied at build
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      assert(s2 ne orig)
      val got = s2.sql(
        "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0)
      assert(got === 11.0)
      // the text kernels ride the same injection: a pure-SQL user can
      // shingle and band-sketch without the Scala API
      val sh = s2.sql("SELECT graft_shingles('a b c d', 3)")
        .head().getSeq[String](0)
      assert(sh === Seq("a b c", "b c d"))
      // ordered form keeps duplicates (shingles distincts them)
      val ng = s2.sql("SELECT graft_ngrams('a b a b', 2)")
        .head().getSeq[String](0)
      assert(ng === Seq("a b", "b a", "a b"))
      val bands = s2.sql(
        "SELECT graft_minhash_bands(graft_shingles('a b c d', 3), 16, 4)")
        .head().getSeq[String](0)
      assert(bands.length === 4 && bands.forall(_.nonEmpty))
      // the fused text→bands form must agree with the composition
      val fused = s2.sql(
        "SELECT graft_minhash_bands_text('a b c d', 3, 16, 4)")
        .head().getSeq[String](0)
      assert(fused === bands)
      // NFC normalization from SQL: decomposed e+U+0301 composes to é
      // (combining char embedded directly — Spark's chr() is byte-only)
      val nfc = s2.sql("SELECT graft_nfc('café')").head().getString(0)
      assert(nfc === "café", s"expected composed form, got $nfc")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("registerAll exposes every testdata table to SQL") {
    Tables.registerAll(spark, sf)
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").columns.nonEmpty, t)
    }
  }

  test("MvRewrite fires for pure-SQL text over a registered view (EP1 ≡ EP2)") {
    import java.nio.file.Files
    import graft.sources.{MaterializedView, Sources}
    import graft.plans.MvRewrite
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_sqlmv").toString
    val t = s"$tmp/base"
    val mv = s"$tmp/view"
    Sources.snapshotCommit(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
        .toDF("id", "g", "x"), t)
    MaterializedView.build(spark, t, mv, rowKey = "id",
      keyCols = Seq("g"), sumCols = Seq("x"))
    MaterializedView.registerForRewrite(spark, t, mv)
    // the SQL entry point resolves the temp view to the SAME
    // LogicalRelation the Dataset API scans, so the optimizer rule
    // fires identically for SQL text — the EP1/EP2 contract extends
    // to the MV layer
    Sources.snapshotRead(spark, t, 1).createOrReplaceTempView("mv_sql_base")
    val q = spark.sql(
      "SELECT g, count(1) AS n, sum(x) AS sum_x FROM mv_sql_base GROUP BY g")
    val scanned = q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("view")))
    assert(q.orderBy("g").as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 2L, 30L), ("b", 1L, 30L)))
    MvRewrite.clear(spark)
    spark.catalog.dropTempView("mv_sql_base")
  }
}
