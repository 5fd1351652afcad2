package graft.tools

/** One-off profiling probe for g34's two halves (sketch growth vs the
  * exact-landmark audit) at SPARK_GRAFT_SF_DIR — measure-first before
  * sizing lgK / iters; see PERF.md round-12 notes. */
object AnfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val lgK = sys.env.getOrElse("SPARK_GRAFT_ANF_LGK", "10").toInt
    val spark = graft.Sessions.local(cpus)
    sys.env.get("SPARK_GRAFT_ANF_FALLBACK").foreach(v =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    val g = graft.graph.PropertyGraph.customerPartGraph(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"ANFPROBE $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.Caches.clear(spark)
    }
    time("sketches") {
      graft.graph.IterativeGraph.hyperBallSketches(g.edges, iters = 3,
        lgK = lgK).count()
    }
    time("audit") {
      graft.graph.IterativeGraph.shortestPathsLandmarks(
          graft.graph.IterativeGraph.symmetrize(g.edges), (1L to 100L),
          iters = 3)
        .groupBy("landmark").count().count()
    }
    // max relative estimate error over the fixed 100-vertex sample
    import org.apache.spark.sql.functions._
    val sk = graft.graph.IterativeGraph.hyperBallSketches(g.edges,
      iters = 3, lgK = lgK)
    val exact = graft.graph.IterativeGraph.shortestPathsLandmarks(
        graft.graph.IterativeGraph.symmetrize(g.edges), (1L to 100L),
        iters = 3)
      .groupBy(col("landmark").as("id")).agg(count(lit(1)).as("exact"))
    val maxErr = exact.join(sk, "id")
      .select((abs(graft.functions.PackedHll.hll5Estimate(col("sk"))
        - col("exact")) / col("exact")).as("err"))
      .agg(max("err")).head.getDouble(0)
    println(f"ANFPROBE maxerr lgK=$lgK $maxErr%.4f")
    spark.stop()
  }
}
