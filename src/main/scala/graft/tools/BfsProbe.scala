package graft.tools

import org.apache.spark.sql.functions._

/** One-off measurement harness for the g08 BFS superstep costs:
  * `runMain graft.tools.BfsProbe` at SPARK_GRAFT_SF_DIR. Times the
  * graph build, then each superstep's expansion/checkpoint/agg
  * phases separately so optimization targets the measured cost, not
  * the guessed one. */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.Sessions.local(cpus)
    import graft.graph.{IterativeGraph, PropertyGraph}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"BFSPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"BFSPROBE ---- full-bfs round $round")
      graft.Caches.clear(spark)
      val g0 = PropertyGraph.customerPartGraph(spark, sfDir)
      val sym0 = PropertyGraph(g0.vertices, IterativeGraph.symmetrize(g0.edges))
      t("bfs() end-to-end") {
        sym0.bfs(col("id") === 1L, col("id") === graft.graph.PropertyGraph.PartIdShift + 7L, 4).count()
      }
    }

    (1 to 2).foreach { round =>
      println(s"BFSPROBE ---- round $round")
      graft.Caches.clear(spark)
      val g = PropertyGraph.customerPartGraph(spark, sfDir)
      val sym = PropertyGraph(g.vertices, IterativeGraph.symmetrize(g.edges))
      val e = t("edges materialize") {
        sym.edges.select(col("src"), col("dst")).localCheckpoint()
      }
      println(s"BFSPROBE edges rows=${e.count()}")
      val targets = sym.vertices.filter(col("id") === graft.graph.PropertyGraph.PartIdShift + 7L)
        .select(col("id").as("__end"))
      var frontier = t("frontier init") {
        sym.vertices.filter(col("id") === 1L)
          .select(col("id").as("__start"), col("id").as("__cur"),
            array(col("id")).as("__path"))
          .localCheckpoint()
      }
      var seen = frontier.select("__start", "__cur").localCheckpoint()
      var depth = 0
      var done = false
      while (depth < 4 && !done) {
        depth += 1
        val expanded = frontier.join(e, frontier("__cur") === e("src"))
          .select(col("__start"), col("dst").as("__cur"),
            concat(col("__path"), array(col("dst"))).as("__path"))
          .join(seen, Seq("__start", "__cur"), "left_anti")
          .groupBy("__start", "__cur").agg(min("__path").as("__path"))
        frontier = t(s"d$depth expand+ckpt") {
          expanded.join(targets, expanded("__cur") === targets("__end"), "left")
            .localCheckpoint()
        }
        val counts = t(s"d$depth counts agg") {
          frontier.agg(count(lit(1)).as("__n"), count(col("__end")).as("__h"))
            .first()
        }
        println(s"BFSPROBE d$depth frontier=${counts.getLong(0)} hits=${counts.getLong(1)}")
        if (counts.getLong(1) > 0L || counts.getLong(0) == 0L) done = true
        else seen = t(s"d$depth seen union ckpt") {
          seen.unionAll(frontier.select("__start", "__cur")).localCheckpoint()
        }
      }
    }
    spark.stop()
  }
}
