package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe for d25's documented posture: SemDeDup's within-cell
  * pair cost is Σ|cell|², so nlist must GROW with the corpus to hold
  * cell sizes (and per-cell pair blocks) constant — the paper runs 50k
  * clusters at web scale. This harness measures semDedupKept on the
  * SAME corpus at fixed nlist (cells grow with the data → quadratic
  * blow-up) vs corpus-proportional nlist (cells constant → ~linear),
  * turning the scaladoc claim into numbers.
  * `runMain graft.tools.SemDedupProbe [nlist ...]` at
  * SPARK_GRAFT_SF_DIR (default: 16 and 16·copies for the 30× replica).
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfx30_r9")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.Sessions.local(cpus)
    val nlists = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 480)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val n = emb.count()
    println(s"SEMDEDUPPROBE corpus $sfDir rows $n")
    nlists.foreach { nlist =>
      // up to 3 runs, but a leg whose run already exceeds 60 s is
      // measured ONCE — the pathological reading IS the result and
      // min-of-3 would re-pay it twice for a digit of precision
      var times = List.empty[(Double, Long)]
      var i = 0
      while (i < 3 && times.forall(_._1 < 60.0)) {
        val t0 = System.nanoTime()
        val kept = graft.similarity.Similarity
          .semDedupKept(emb, minCos = 0.4, dim = 64, nlist = nlist, seed = 7L)
          .count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.Caches.clear(spark)
        println(f"SEMDEDUPPROBE nlist=$nlist%-5d run ${i + 1} $t%.2f s kept $kept")
        times :+= ((t, kept))
        i += 1
      }
      println(f"SEMDEDUPPROBE nlist=$nlist%-5d kept=${times.head._2}%-7d " +
        f"runs ${times.map(_._1).map(t => f"$t%.2f").mkString(" ")} " +
        f"min ${times.map(_._1).min}%.2f s")
    }
    spark.stop()
  }
}
