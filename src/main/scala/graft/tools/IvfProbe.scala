package graft.tools

import org.apache.spark.sql.functions._

/** One-off recall probe for the trained-IVF sweep: widens the nprobe
  * grid and tries alternative nlist values so the documented default
  * is a measured point, not a guess.
  * `runMain graft.tools.IvfProbe` at SPARK_GRAFT_SF_DIR. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.Sessions.local(cpus)
    val emb = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 20)
    Seq(8, 16).foreach { nlist =>
      println(s"IVFPROBE nlist=$nlist")
      graft.ml.VectorSearch.ivfProbeSweepTrained(q, emb, k = 10,
          nlist = nlist, nprobes = Seq(1, 2, 3, 4, 6, 8, 10, 12), seed = 1L)
        .orderBy("nprobe").collect()
        .foreach(r => println(s"IVFPROBE   nprobe=${r.getLong(0)} " +
          s"recall=${r.getDouble(4)} min_hits=${r.getLong(3)}"))
      graft.Caches.clear(spark)
    }
    spark.stop()
  }
}
