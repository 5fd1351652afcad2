package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named SparkEntry queries to files:
  * `runMain graft.tools.Explain <outDir> <query>...` — the plan
  * evidence artifact for the optimization rounds (plans/r15/...).
  * Queries that drive multiple actions imperatively (index builds,
  * per-step loops) explain their RETURNED frame; the imperative
  * phases are visible only in code, which the optimization notes say
  * explicitly where it matters. */
object Explain {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    Files.createDirectories(Paths.get(outDir))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.Sessions.local(cpus)
    args.tail.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
      graft.Caches.clear(spark)
      println(s"EXPLAIN $name -> $outDir/$name.txt (${txt.length} chars)")
    }
    graft.Sessions.quiesceStreaming(spark)
    spark.stop()
  }
}
