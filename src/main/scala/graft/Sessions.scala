package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine's entry points (Verify/Bench/Smoke).
  *
  * Central place for engine-wide session config so loaders never
  * mutate a live session's conf:
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the driver testdata's
  *    events.parquet is TIMESTAMP(NANOS), which Spark's reader
  *    otherwise rejects ([PARQUET_TYPE_ILLEGAL]); Tables.events
  *    normalizes the raw nanos to TimestampType micros.
  *  - shuffle partitions sized to the core count (local mode), not the
  *    200 default meant for clusters. SPARK_GRAFT_SHUFFLE_PARTITIONS
  *    overrides for scale probes: at N× replicas a shuffle partition
  *    holds N× the rows, and past ~30× the sort/agg spill turns keyed
  *    shuffles super-linear — exactly the knob a cluster deployment
  *    sizes by input bytes (spark.sql.files.maxPartitionBytes + AQE
  *    target size do it automatically there).
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val shuffleParts =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // §2.2 probe knob (r16, VERDICT item 3 — adjudicating the r15
    // 8-core-beats-32 inversion): when set (e.g. "64m"), AQE sizes
    // post-shuffle partitions by BYTES — parallelismFirst=false with
    // this advisory target — instead of coalescing only down to the
    // default parallelism. This is the same knob a cluster sizes by
    // input bytes (guide §2.2/§9); OFF by default pending the
    // measured verdict (PERF.md r16) so bench comparability holds.
    sys.env.get("SPARK_GRAFT_AQE_ADVISORY").foreach { sz =>
      b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
          "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", sz)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Quiesce streaming machinery BEFORE `spark.stop()` in a main that
    * ran Structured Streaming queries: stop any still-active query,
    * then shut the state-store maintenance task and unload loaded
    * providers. Skipping this lets the maintenance thread race
    * SparkContext teardown and print an RpcEnvStoppedException wall
    * into the process tail (the r13 bench-artifact failure). Each step
    * is best-effort — teardown noise must never fail the run that
    * produced the results. */
  def quiesceStreaming(spark: SparkSession): Unit = {
    spark.streams.active.foreach(q => scala.util.Try(q.stop()))
    scala.util.Try(
      org.apache.spark.sql.execution.streaming.state.StateStore.stop())
    ()
  }
}
