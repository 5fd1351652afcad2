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
  *    200 default meant for clusters.
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
