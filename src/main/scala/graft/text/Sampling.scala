package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mix operators for training pipelines.
  *
  * Random sampling (`df.sample`, `sampleBy`) is irreproducible across
  * engines and re-runs; training splits must be CONTENT-keyed so the
  * same document always lands in the same bucket no matter the engine,
  * partitioning, or run. These operators derive buckets from a content
  * hash — pure expressions, zero shuffle, scan-stage cost at 100 TB.
  */
object Sampling {

  /** Stable bucket in [0, nBuckets) from the first 32 bits of
    * md5(key) — engine-portable (md5 + hex-string parse exist
    * everywhere; the DuckDB oracle uses `CAST('0x'||substr(md5(k),1,8)
    * AS BIGINT)`). Uniform to within 1 part in 2³²/nBuckets (2³² mod
    * nBuckets residue — ~2·10⁻¹⁰ per bucket at nBuckets=10), so the
    * splitLabel defaults really are 70/10/20. For Spark-only pipelines
    * `xxhash64(key) pmod nBuckets` is cheaper but not oracle-portable. */
  def hashBucket(key: Column, nBuckets: Int): Column =
    (conv(substring(md5(key), 1, 8), 16, 10).cast("long") % nBuckets).cast("int")

  /** Deterministic train/val/test assignment by content hash. */
  def splitLabel(key: Column, nBuckets: Int = 10,
      trainUpto: Int = 7, valUpto: Int = 8): Column = {
    val b = hashBucket(key, nBuckets)
    when(b < trainUpto, lit("train"))
      .when(b < valUpto, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic stratified (per-group rate) downsampling — the
    * data-mix primitive for rebalancing an overrepresented stratum
    * ("keep 25% of English, all of the rest"). A row survives iff its
    * content-hash bucket (of `nBuckets`) falls below its stratum's
    * fraction — reproducible across engines/runs/partitionings, unlike
    * `df.stat.sampleBy` (RNG). Scan-stage filter, zero shuffle; exact
    * per-document determinism, fraction resolution 1/nBuckets. */
  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
      fractions: Map[String, Double], default: Double = 1.0,
      nBuckets: Int = 10000): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(key, nBuckets) < frac * nBuckets)
  }

  /** Deterministic global shuffle + shard assignment — the training-
    * data EXPORT primitive: a corpus must be written as N shards in a
    * reproducible pseudo-random order (so every epoch/re-run/engine
    * sees the same byte stream), without a global orderBy, which would
    * serialize 100 TB through a single total-order sort.
    *
    * shard = md5-bucket of (salt, id)  — embarrassingly parallel;
    * pos   = rank of the full md5 hex WITHIN the shard (keyed window:
    *         each shard sorts ~corpus/nShards rows independently).
    *
    * Different `salt` values give independent permutations (epoch
    * reshuffles). Engine-portable: md5-hex everywhere, same contract
    * as [[hashBucket]]. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = concat_ws("|", lit(salt), col(idCol).cast("string"))
    df.withColumn("__hx", md5(salted))
      .withColumn("shard",
        (conv(substring(col("__hx"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__hx"), col(idCol))))
      .drop("__hx")
  }

  /** Weighted upsampling: emit `weightCol` copies of each row
    * (1-indexed `copy_no`) — the data-mix construction primitive
    * ("3 epochs of wiki, 1 of crawl"). A generator, not a join: cost
    * is proportional to output rows only. Weights < 1 emit NOTHING —
    * guarded explicitly, because Spark's `sequence(1, 0)` counts DOWN
    * ([1, 0]) instead of returning empty. */
  def upsample(df: DataFrame, weightCol: Column): DataFrame =
    df.withColumn("copy_no", explode(
      when(weightCol >= 1, sequence(lit(1), weightCol))
        .otherwise(array().cast("array<int>"))))
}
