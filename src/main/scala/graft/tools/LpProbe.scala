package graft.tools

import org.apache.spark.graphx.PartitionStrategy

/** One-off experiment harness: GraphX LabelPropagation cost vs graph
  * partition count / partition strategy at SPARK_GRAFT_SF_DIR — the
  * measure-first loop behind the g06 adapter tuning (PERF.md r6). */
object LpProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      Runtime.getRuntime.availableProcessors.toString)
    val g = graft.graph.PropertyGraph.customerPartGraph(spark, dir)
    for (p <- Seq(16, 8, 4, 2)) {
      // strategy threaded through toGraphX so strat=none really is the
      // arrival-order layout (a partitionBy on an already-2D graph
      // would compare 2D against itself)
      for (strat <- Seq(None, Some(PartitionStrategy.EdgePartition2D))) {
        val gp = g.toGraphX(None, Some(p), strat)
        gp.edges.count() // materialize the cached graph outside the timer
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          org.apache.spark.graphx.lib.LabelPropagation.run(gp, 4)
            .vertices.count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"LPPROBE parts=$p%-3d strat=${strat.fold("none")(_ => "2d")}%-4s " +
          times.map(t => f"$t%.2f").mkString(" "))
        gp.unpersist()
      }
    }
    spark.stop()
  }
}
