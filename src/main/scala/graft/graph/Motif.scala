package graft.graph

/** Parser for the GraphFrames motif pattern language (the reference's
  * `graph.find`, goodreads.py:582): terms separated by `;`, each term
  * `(a)-[e]->(b)` with optional names (empty = anonymous) and optional
  * `!` negation. Grammar is the public GraphFrames one; the compiler
  * lives in [[PropertyGraph.find]].
  */
private[graph] object Motif {

  /** One pattern term: `src -[edge]-> dst`, any part anonymous. */
  final case class Term(src: Option[String], edge: Option[String],
      dst: Option[String], negated: Boolean)

  private val TermRe =
    """^\s*(!?)\s*\((\w*)\)\s*-\s*\[(\w*)\]\s*->\s*\((\w*)\)\s*$""".r

  def parse(pattern: String): Seq[Term] = {
    require(pattern.trim.nonEmpty, "empty motif pattern")
    pattern.split(";").toSeq.map {
      case TermRe(bang, s, e, d) =>
        val t = Term(Option(s).filter(_.nonEmpty), Option(e).filter(_.nonEmpty),
          Option(d).filter(_.nonEmpty), bang == "!")
        if (t.negated) {
          require(t.edge.isEmpty,
            s"negated term must use an anonymous edge: $pattern")
          require(t.src.nonEmpty && t.dst.nonEmpty,
            s"negated term must name both vertices: $pattern")
        }
        t
      case other =>
        throw new IllegalArgumentException(
          s"cannot parse motif term '${other.trim}' " +
            "(expected '(a)-[e]->(b)', '!' prefix for negation)")
    }
  }
}
