package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Executes a FINITE Structured Streaming pipeline end-to-end and
  * returns its materialized result — the bridge that lets the
  * streaming operators participate in the batch-oriented driver
  * contract (SparkEntry.queries → Verify/Bench → DuckDB oracle).
  *
  * Mechanics: the batch input is written to a parquet staging dir,
  * streamed back through the FILE SOURCE (the same source a production
  * deployment tails, schema pinned explicitly), run through
  * `transform` with `Trigger.AvailableNow` (process-everything-then-
  * stop — the replay/backfill trigger), and collected in a memory
  * sink. The query that comes back out is the REAL streaming engine's
  * output: micro-batch planner, state store, watermark accounting —
  * not a batch rewrite of it.
  *
  * Scale notes: the staging write is an artifact of the harness, not
  * the operator (production reads the live source directly); the
  * memory sink bounds are the aggregate's, not the stream's (windowed
  * counts / dedup survivors). Sink table names are uniquified per run
  * so repeated invocations in one session never read a stale view.
  */
object StreamRunner {

  private val runSeq = new AtomicLong(0)

  def runAvailableNow(spark: SparkSession, batch: DataFrame, name: String,
      outputMode: String)(transform: DataFrame => DataFrame): DataFrame = {
    val stage = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_stream/$name"
    batch.write.mode("overwrite").parquet(stage)
    val src = spark.readStream.schema(batch.schema).parquet(stage)
    val sink = s"${name}_${runSeq.incrementAndGet()}"
    val q = transform(src).writeStream
      .format("memory").queryName(sink).outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }
}
