package graft.tools

import org.apache.spark.sql.functions._

/** One-off profiling probe for g34's two halves (sketch growth vs the
  * exact-landmark audit) at SPARK_GRAFT_SF_DIR — measure-first before
  * sizing lgK / iters; see PERF.md round-12/14 notes.
  *
  * Emits the COST-MODEL inputs alongside the timings: `messages` is
  * the symmetrized edge count — HyperBall sends exactly one sketch
  * per symmetrized edge per superstep, so
  * bytes/superstep ≈ messages × wire(lgK), with
  * wire(lgK) = 1 + ⌈5·2^lgK/8⌉ B dense (hop ≥ 2) and ~6 B sparse
  * (hop 1, seed-sized balls). The sketches timing, `messages`, and
  * lgK at several scales pin the model's constant (see PERF.md).
  *
  * The maxerr audit REUSES the timed run's localCheckpoint'd frames —
  * the r13 probe recomputed the full superstep loop AND the landmark
  * BFS a second time for the error join, doubling a multi-minute
  * probe at large scale. */
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
    def timed[A](name: String)(f: => (A, Long)): A = {
      val t0 = System.nanoTime()
      val (a, n) = f
      println(f"ANFPROBE $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      a
    }
    val nMsgs = graft.graph.IterativeGraph.symmetrize(g.edges).count()
    println(s"ANFPROBE messages $nMsgs per superstep " +
      s"(dense wire ${1 + (5 * (1 << lgK) + 7) / 8} B at lgK=$lgK)")
    val sk = timed("sketches") {
      val s = graft.graph.IterativeGraph.hyperBallSketches(g.edges,
        iters = 3, lgK = lgK)
      (s, s.count())
    }
    val exact = timed("audit") {
      val e = graft.graph.IterativeGraph.shortestPathsLandmarks(
          graft.graph.IterativeGraph.symmetrize(g.edges), (1L to 100L),
          iters = 3)
        .groupBy(col("landmark").as("id")).agg(count(lit(1)).as("exact"))
        .localCheckpoint()
      (e, e.count())
    }
    // max relative estimate error over the fixed 100-vertex sample —
    // joins the two checkpointed frames, recomputes nothing
    val maxErr = exact.join(sk, "id")
      .select((abs(graft.functions.PackedHll.hll5Estimate(col("sk"))
        - col("exact")) / col("exact")).as("err"))
      .agg(max("err")).head.getDouble(0)
    println(f"ANFPROBE maxerr lgK=$lgK $maxErr%.4f")
    graft.Caches.clear(spark)
    spark.stop()
  }
}
