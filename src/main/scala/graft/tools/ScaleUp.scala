package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds a COPIES× replica of a testdata dir for larger-scale perf
  * spot-checks (PERF.md's mixed-scale table): each copy shifts every
  * key family by a disjoint offset so joins stay consistent and
  * cardinalities scale linearly — fact tables, documents and
  * embeddings grow COPIES×, dimension tables (region/nation) stay.
  *
  * Document text is Caesar-rotated per copy (translate over [a-z0-9] —
  * digits included, because the tokenizer keeps [a-z0-9] runs and an
  * a-z-only rotation would leave digit-bearing shingles identical
  * across copies): identical text across copies would plant
  * COPIES·(COPIES·2−1) real near-dup pairs per document — a
  * quadratic-in-duplication semantic blowup that would make the dedup
  * queries measure duplicate-volume growth, not corpus-size scaling.
  * Rotation keeps per-copy token statistics (lengths, frequencies)
  * while making cross-copy shingle sets disjoint.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <copies> [tables]
  *
  * Optional 4th arg: comma-separated table names to replicate; every
  * other table is copied 1× (the dir stays loadable). ALL families
  * are collision-free to 100 copies: graph vertex shifts use
  * PropertyGraph.PartIdShift = 1e8 (customers reach ~2e6 at 100×,
  * partkeys ~1e7 — both clear of each other and of the shift; the
  * r1–r9 1e6 shift merged customers into part vertices past ~50
  * copies, capping graph scale probes at 30×), and the doc stride
  * (3e6) keeps replica ids out of every copy's planted +1e6 window
  * (base docs < 100k).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, out, copies) = (args(0), args(1), args(2).toInt)
    val only: Set[String] =
      args.lift(3).map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    require(copies >= 1 && copies <= 100,
      s"copies must be in [1, 100] (got $copies)")
    val spark = graft.Sessions.local(
      Runtime.getRuntime.availableProcessors.toString)

    val KO = 10000000L // orderkey stride (sf0.1 max ~6e6)
    // above 10 copies the 100k custkey/doc_id strides would cross the
    // +1e6 shifts the DOC queries apply (planted-duplicate ids =
    // doc_id+1e6) and, before PartIdShift widened to 1e8, the part
    // vertex shift too. Wide mode keeps every replica family clear:
    //  - custkey stride 20k (max id 15000) → customers < 2e6 ≪ 1e8,
    //    below every shifted part vertex id at any copy count;
    //  - doc_id stride 3e6 → replica ids never land in ANY copy's
    //    planted +1e6 window (base docs < 100k).
    // 10-copy dirs built by earlier rounds keep their old key layout
    // (narrow strides) for comparability.
    val wide = copies > 10
    val KC = if (wide) 20000L else 100000L   // custkey stride (max 15000)
    val KP = 100000L   // partkey stride (max 20000; vertex shift +1e6 applies per copy)
    val KS = 100000L   // suppkey stride
    val KD = if (wide) 3000000L else 100000L // doc_id stride
    val KV = 1000000L  // vec_id stride
    val KE = 100000000L // event_id stride
    val KU = 100000L   // user_id stride

    def rep(name: String, shift: (DataFrame, Int) => DataFrame): Unit = {
      if (only.nonEmpty && !only(name)) { copy(name); return }
      val base = spark.read.parquet(s"$src/$name.parquet")
      val copiesDf = (0 until copies).map(i => shift(base, i))
        .reduce(_ unionByName _)
      copiesDf.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"SCALEUP $name x$copies -> $out")
    }
    def copy(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"SCALEUP $name x1 (dimension) -> $out")
    }

    // rotate letters AND digits: the tokenizer keeps [a-z0-9] runs, so
    // an a-z-only rotation would leave digit tokens (and any shingle
    // containing one) identical across copies — partially reintroducing
    // the cross-copy near-dup blowup the rotation exists to prevent
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"
    def rot(i: Int): String = {
      val k = i % 26
      val d = i % 10
      alpha.substring(k) + alpha.substring(0, k) +
        digits.substring(d) + digits.substring(0, d)
    }

    copy("region"); copy("nation")
    // c_nationkey deliberately NOT shifted: nation is a dimension,
    // copied unshifted
    rep("customer", (d, i) => d.withColumn("c_custkey", col("c_custkey") + i * KC))
    rep("supplier", (d, i) => d.withColumn("s_suppkey", col("s_suppkey") + i * KS))
    rep("part", (d, i) => d.withColumn("p_partkey", col("p_partkey") + i * KP))
    rep("orders", (d, i) => d.withColumn("o_orderkey", col("o_orderkey") + i * KO)
      .withColumn("o_custkey", col("o_custkey") + i * KC))
    rep("lineitem", (d, i) => d.withColumn("l_orderkey", col("l_orderkey") + i * KO)
      .withColumn("l_partkey", col("l_partkey") + i * KP)
      .withColumn("l_suppkey", col("l_suppkey") + i * KS))
    // events.ts stays raw nanos-long (written back as read) so the
    // normalizing Tables.events loader applies unchanged
    rep("events", (d, i) => d.withColumn("event_id", col("event_id") + i * KE)
      .withColumn("user_id", col("user_id") + i * KU))
    rep("documents", (d, i) => d.withColumn("doc_id", col("doc_id") + i * KD)
      .withColumn("text", translate(col("text"), alpha + digits, rot(i))))
    rep("embeddings", (d, i) => d.withColumn("vec_id", col("vec_id") + i * KV))
    spark.stop()
  }
}
