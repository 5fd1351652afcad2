package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided star-schema testdata (TESTDATA.md).
  *
  * Tables: region, nation, customer, supplier, part, orders, lineitem,
  * events, documents, embeddings — one parquet file per table under
  * `\$dir/\$name.parquet`.
  *
  * All loads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file format (verify with
  * `df.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized + persisted per (session, dir): Bench/Verify touch every
    * table from dozens of queries — scan once, serve from cache. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    Memo.df(spark, s"table|$dir|$name")(spark.read.parquet(s"$dir/$name.parquet"))

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Sessions built by
    * [[Sessions.local]] set `spark.sql.legacy.parquet.nanosAsLong` up
    * front (a loader must not mutate a live session's conf — an
    * unrelated caller reading nanos parquet would be surprised); this
    * loader asserts the flag and normalizes the raw nanos to a
    * TimestampType column (micros, Spark's native precision) so
    * downstream ops see a clean schema. */
  def events(spark: SparkSession, dir: String): DataFrame =
    Memo.df(spark, s"events-norm|$dir") {
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .contains("true"),
        "events.parquet is TIMESTAMP(NANOS): build the session via " +
          "graft.Sessions.local (sets spark.sql.legacy.parquet.nanosAsLong)")
      spark.read.parquet(s"$dir/events.parquet")
        // integer `div`: ns epoch exceeds 2^53, double division would lose ticks
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` (EP2) sees the
    * same relations the Dataset API (EP1) uses. `events` must go
    * through its normalizing loader — the raw parquet TIMESTAMP(NANOS)
    * is illegal to a plain scan (SqlParitySpec pins this). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
