package graft.tools

import org.apache.spark.sql.functions._

/** One-off measurement harness for the sw04 streaming near-dup cost:
  * `runMain graft.tools.SwProbe` at SPARK_GRAFT_SF_DIR. Splits the
  * pipeline into (a) stateless band-kernel scan through the streaming
  * engine, (b) the full stream-stream banded join, (c) the same join
  * as a batch query — so the join-state overhead is measured, not
  * guessed. */
object SwProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.Sessions.local(cpus)
    import graft.streaming.{EventStreams, StreamRunner}
    import graft.Tables

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SWPROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def stamped(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("ts", expr("timestamp_seconds(1704067200 + doc_id)"))
    val feed = stamped(docs).unionByName(
      stamped(docs.withColumn("doc_id", col("doc_id") + 1000000)))

    (1 to 2).foreach { round =>
      println(s"SWPROBE ---- round $round")
      // (a) stateless: band kernel + explode, no join, through streaming
      t("stateless kernel scan") {
        StreamRunner.runAvailableNow(spark, feed, "swprobe_scan", "append") { src =>
          val bands = {
            import org.apache.spark.sql.GraftExpressionBridge
            import org.apache.spark.sql.catalyst.expressions.Literal
            GraftExpressionBridge.column(graft.functions.TextKernelExprs
              .minhashBandsText(Seq(
                GraftExpressionBridge.expression(col("text")),
                Literal(3), Literal(16),
                Literal(4))))
          }
          src.withColumn("__bands", bands)
            .filter(size(col("__bands")) > 0)
            .withWatermark("ts", "30 days")
            .select(col("doc_id"), col("ts"),
              posexplode(col("__bands")).as(Seq("band", "bh")))
        }.count()
      }
      // (b) full stream-stream join
      t("full stream join") {
        StreamRunner.runAvailableNow(spark, feed, "swprobe_join", "append") { src =>
          EventStreams.nearDupCandidatesPortable(src, "doc_id", "text", "ts",
            watermark = "30 days", maxSkew = "30 days", n = 3,
            numHashes = 16, bands = 4)
        }.select("id_a", "id_b", "band").distinct().count()
      }
      // (c) batch form of the same banded self-join
      t("batch banded self-join") {
        def banded(idName: String, tsName: String, b: String, bh: String) = {
          import org.apache.spark.sql.GraftExpressionBridge
          import org.apache.spark.sql.catalyst.expressions.Literal
          feed.withColumn("__bands", GraftExpressionBridge.column(
              graft.functions.TextKernelExprs.minhashBandsText(Seq(
                GraftExpressionBridge.expression(col("text")),
                Literal(3), Literal(16),
                Literal(4)))))
            .filter(size(col("__bands")) > 0)
            .select(col("doc_id").as(idName), col("ts").as(tsName),
              posexplode(col("__bands")).as(Seq(b, bh)))
        }
        banded("id_a", "ts_a", "band_a", "bh_a")
          .join(banded("id_b", "ts_b", "band_b", "bh_b"),
            col("band_a") === col("band_b") && col("bh_a") === col("bh_b"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "band_a").distinct().count()
      }
      graft.Caches.clear(spark)
    }
    // probe hygiene (VERDICT r14 item 5): quiesce streaming state
    // machinery before teardown so the probe log tail stays readable
    graft.Sessions.quiesceStreaming(spark)
    spark.stop()
  }
}
