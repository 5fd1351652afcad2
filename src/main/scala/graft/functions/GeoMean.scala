package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator` — the engine's custom-UDAF
  * tier (SURVEY §2.11: the reference needed none; training-data
  * pipelines do — think per-group perplexity/quality products).
  *
  * Buffer is (Σ ln x, n): partial aggregation (map-side combine) and
  * merge work exactly like any built-in agg, so the shuffle carries two
  * numbers per group, never the values. Non-positive inputs are
  * skipped (ln undefined) — documented, not silent NaN. */
final case class GeoMeanBuf(sumLn: Double, n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  type Buf = GeoMeanBuf
  private def Buf(sumLn: Double, n: Long): Buf = GeoMeanBuf(sumLn, n)

  override def zero: Buf = Buf(0.0, 0L)
  override def reduce(b: Buf, x: Double): Buf =
    if (x > 0.0) Buf(b.sumLn + math.log(x), b.n + 1) else b
  override def merge(a: Buf, b: Buf): Buf = Buf(a.sumLn + b.sumLn, a.n + b.n)
  override def finish(b: Buf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
