package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{EventStreams, StreamRunner}

/** EXECUTED Structured Streaming queries — unlike the StreamingSpec
  * (which drives MemoryStream micro-batches in tests), these run the
  * real file-source → watermark → stateful-aggregate → sink pipeline
  * through graft.streaming.StreamRunner and are oracle-checked against
  * the SAME DuckDB SQL as their batch twins: streaming-vs-batch
  * consistency is the declared contract of the facade (SURVEY §2.12),
  * so it is verified, not asserted.
  */
object StreamingQueries {

  val all: Seq[NamedQuery] = Seq(

    // ---- streaming tumbling-window counts (twin of q17): same window()
    // expression lifted onto the streaming engine; complete mode emits
    // every window once input is exhausted (AvailableNow).
    NamedQuery("sw01_stream_tumbling_counts",
      (s, dir) => {
        val res = StreamRunner.runAvailableNow(s, Tables.events(s, dir),
            "sw01_tumbling", "complete") { src =>
          EventStreams.windowedTypeCounts(src, "6 hours", "1 hour")
        }
        res.select(
            date_format(col("win_start"), "yyyy-MM-dd HH:mm").as("win_start"),
            col("event_type"), col("cnt"), col("total_value"))
          .orderBy("win_start", "event_type")
      },
      Some("""SELECT strftime(make_timestamp((epoch_us(ts) // 21600000000) * 21600000000),
             |                '%Y-%m-%d %H:%M') AS win_start,
             |  event_type, count(*) AS cnt, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // ---- streaming exact dedup (ingest-time twin of d01's keep set):
    // documents + planted replays flow through
    // dropDuplicatesWithinWatermark; the surviving rows bucketed by
    // content hash prefix must equal the batch DISTINCT-text counts.
    // (Bucketing by CONTENT keeps the check deterministic even though
    // which twin of a duplicate pair survives a single micro-batch is
    // not.)
    NamedQuery("sw02_stream_dedup_buckets",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        // deterministic arrival times: one second per id, replays later
        def stamped(d: org.apache.spark.sql.DataFrame) =
          d.withColumn("ts", expr("timestamp_seconds(1704067200 + doc_id)"))
        val feed = stamped(docs).unionByName(
          stamped(docs.withColumn("doc_id", col("doc_id") + 1000000)))
        val kept = StreamRunner.runAvailableNow(s, feed,
            "sw02_dedup", "append") { src =>
          EventStreams.dedupByContent(src, "text", "ts", watermark = "30 days")
        }
        kept.groupBy(substring(md5(col("text")), 1, 1).as("bucket"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("bucket")
      },
      Some("""SELECT substr(md5(text), 1, 1) AS bucket,
             |  count(DISTINCT text) AS n_docs
             |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin))
  )
}
