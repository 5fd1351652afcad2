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
  /** events.ts normalization. Driver testdata generations have shipped
    * `ts` both as parquet TIMESTAMP(NANOS) (which Spark's reader only
    * accepts as a raw long under `spark.sql.legacy.parquet.nanosAsLong`
    * — [[Sessions.local]] sets it up front, since a loader must not
    * mutate a live session's conf) and, since round 8, as native
    * TIMESTAMP(MICROS). This loader dispatches on the READ schema: a
    * long `ts` is nanos and gets integer-div'd down to micros (ns
    * epoch exceeds 2^53 — double division would lose ticks); a native
    * timestamp passes through untouched. Downstream ops always see
    * TimestampType at Spark's native micros precision. */
  def events(spark: SparkSession, dir: String): DataFrame =
    Memo.df(spark, s"events-norm|$dir") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      // nanos parquet without the legacy conf fails at schema read with
      // the raw [PARQUET_TYPE_ILLEGAL] — rethrow with the fix attached
      // (the conf must be set BEFORE first use; a loader can't mutate a
      // live session's conf, Sessions.local sets it up front)
      val raw = try spark.read.parquet(s"$dir/events.parquet") catch {
        case e: Throwable
            if String.valueOf(e.getMessage).contains("PARQUET_TYPE_ILLEGAL") =>
          throw new IllegalStateException(
            "events.parquet carries legacy TIMESTAMP(NANOS); build the session " +
              "with spark.sql.legacy.parquet.nanosAsLong=true (graft.Sessions." +
              "local does) so this loader can normalize ts to micros", e)
      }
      raw.schema("ts").dataType match {
        case TimestampType => raw
        // unannotated micros parquet (isAdjustedToUTC=false) reads as
        // NTZ; the session tz is pinned to UTC (Sessions.local), so
        // this cast is epoch-identical to DuckDB's naive read
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case other => throw new IllegalStateException(
          s"events.ts: expected TIMESTAMP[/_NTZ] or legacy nanos LONG, got $other")
      }
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
