package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Map-side top-k aggregation (SURVEY §2.11 family).
  *
  * A per-group top-k via a window (`row_number over (order by score)`)
  * shuffles EVERY scored row to the group's reducer — at an exact-ANN
  * brute force that is queries × corpus rows. This typed Aggregator
  * keeps a bounded buffer per group in the PARTIAL (map-side) phase,
  * so the shuffle carries at most k rows per group per input
  * partition: the same plan shape a 1000-executor exact-scan ANN
  * needs. Deterministic: (score desc, id asc) total order.
  */
object TopK {

  case class Scored(id: Long, score: Double)
  case class Buf(rows: Seq[Scored])

  /** Keep the k largest by (score desc, id asc). The buffer compacts
    * lazily at 4k to amortize sorting. Scores are canonicalized with
    * `+ 0.0` so -0.0 (e.g. `round` of a tiny negative cosine) compares
    * equal to 0.0 — matching SQL/DuckDB total order at a top-k
    * boundary, where the id tie-break must decide, not the sign bit. */
  class TopKAgg(k: Int) extends Aggregator[Scored, Buf, Seq[Scored]] {
    private def best(rows: Seq[Scored]): Seq[Scored] =
      rows.sortBy(s => (-(s.score + 0.0d), s.id)).take(k)
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(b: Buf, a: Scored): Buf = {
      val r = b.rows :+ a
      Buf(if (r.length > 4 * k) best(r) else r)
    }
    override def merge(a: Buf, b: Buf): Buf = Buf(best(a.rows ++ b.rows))
    override def finish(b: Buf): Seq[Scored] = best(b.rows)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Aggregate column: top-k (id, score) structs, ordered. Invoke as
    * `topK(k)(idCol, scoreCol)` inside a groupBy. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[Scored])
    (id, score) => fn(id, score)
  }
}
