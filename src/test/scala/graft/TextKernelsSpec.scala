package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The StaticInvoke shingle kernel must be semantically identical to
  * the pure-expression form it replaced (and therefore to the DuckDB
  * oracle) — checked on crafted edges and seeded randomized text. */
class TextKernelsSpec extends SparkSpec {

  private def bothForms(texts: Seq[String], n: Int): Seq[(Seq[String], Seq[String])] = {
    import spark.implicits._
    texts.toDF("text")
      .select(
        Dedup.shingles(col("text"), n).as("fast"),
        Dedup.shinglesExpr(col("text"), n).as("ref"))
      .as[(Seq[String], Seq[String])].collect().toSeq
  }

  test("kernel matches expression form on crafted edge cases") {
    val cases = Seq(
      "", " ", "a", "a b", "a b c", "a  b\t\nc", "The QUICK brown-fox!",
      "123 abc 456", "!!!leading and trailing***", "répété répété accents",
      "dup dup dup dup", "a b a b a b", "x" * 500,
      "Mixed CASE with Ümlauts and ßharp")
    for (n <- Seq(2, 3, 4)) {
      bothForms(cases, n).zip(cases).foreach { case ((fast, ref), txt) =>
        assert(fast === ref, s"mismatch for n=$n text=<$txt>")
      }
    }
  }

  test("ngrams kernel matches expression form: order, duplicates, edges (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Array("the", "a", "dup", "x1", "café", "!!", "Zebra99")
    def text(): String =
      Seq.fill(rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" ")
    val cases = Seq("", "a", "a b", "dup dup dup", "a b a b") ++ Seq.fill(60)(text())
    for (n <- Seq(2, 3)) {
      cases.toDF("text")
        .select(graft.text.TextOps.ngramsOrdered(col("text"), n).as("fast"),
          graft.text.TextOps.ngramsOrderedExpr(col("text"), n).as("ref"))
        .as[(Seq[String], Seq[String])].collect()
        .foreach { case (fast, ref) => assert(fast === ref, s"n=$n") }
    }
  }

  test("kernel matches expression form on seeded randomized text (property)") {
    val rnd = new scala.util.Random(42)
    val words = Array("the", "café", "x1", "", "-", "A_B", "Zebra99", "ünïcode",
      "mixedCASE", "123", "!!", "tab\tsep")
    val seps = Array(" ", ", ", "  ", "\n", "!", "")
    def text(): String =
      Seq.fill(rnd.nextInt(30))(words(rnd.nextInt(words.length)))
        .mkString(seps(rnd.nextInt(seps.length)))
    for (round <- 1 to 8) {
      val texts = Seq.fill(40)(text())
      val n = 2 + rnd.nextInt(4)
      bothForms(texts, n).foreach { case (fast, ref) =>
        assert(fast === ref, s"round $round n=$n")
      }
    }
  }

  test("ASCII input is locale-independent (tr-TR dotted-I trap)") {
    // Spark's lower() takes a locale-independent ASCII fast path for
    // all-ASCII strings; the kernel must do the same — under a tr-TR
    // default locale a blanket String.toLowerCase() would turn "TITLE"
    // into "tıtle" (dotless ı is non-[a-z], splitting the token)
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val got = graft.functions.TextKernels
        .shingles(org.apache.spark.unsafe.types.UTF8String.fromString(
          "TITLE WITH CAPITAL I"), 2)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got === Seq("title with", "with capital", "capital i"))
    } finally java.util.Locale.setDefault(prev)
  }

  test("shingle invariants: n-token join, distinct, order-preserving") {
    import spark.implicits._
    val got = bothForms(Seq("one two three two three four"), 3).head._1
    assert(got === Seq("one two three", "two three two", "three two three",
      "two three four"))
    assert(got.forall(_.split(" ").length === 3))
  }

  test("portable minhash band kernel matches the expression form (property)") {
    import spark.implicits._
    import graft.streaming.EventStreams
    val rnd = new scala.util.Random(7)
    val words = Array("spark", "scan", "join", "agg", "x9", "row", "batch", "key")
    def text(): String =
      Seq.fill(3 + rnd.nextInt(40))(words(rnd.nextInt(words.length))).mkString(" ")
    // include shingle-less docs (< 3 tokens): both forms must agree on
    // the empty-input contract ([] → []), not just post-filter
    val texts = Seq.fill(60)(text()) ++ Seq("short doc", "one")
    val sh = graft.dedup.Dedup.shingles(col("text"), 3)
    val got = texts.toDF("text")
      .select(
        EventStreams.minhashBandsPortableKernel(sh, 16, 4).as("fast"),
        EventStreams.minhashBandsPortableExpr(sh, 16, 4).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    assert(got.nonEmpty)
    got.foreach { case (fast, ref) => assert(fast === ref) }
  }

  test("fused text→bands kernel matches shingles∘bands composition (property)") {
    import spark.implicits._
    import org.apache.spark.sql.GraftExpressionBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    val rnd = new scala.util.Random(11)
    val words = Array("spark", "scan", "join", "agg", "x9", "row", "batch",
      "key", "Ümlaut", "123")
    def text(): String =
      Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length))).mkString(" ")
    val texts = Seq.fill(80)(text()) ++
      Seq("", "one", "short doc", "dup dup dup dup", "a b a b a b")
    def fused(t: org.apache.spark.sql.Column) =
      GraftExpressionBridge.column(graft.functions.TextKernelExprs
        .minhashBandsText(Seq(GraftExpressionBridge.expression(t),
          Literal(3), Literal(16), Literal(4))))
    val got = texts.toDF("text")
      .select(
        fused(col("text")).as("fast"),
        graft.streaming.EventStreams.minhashBandsPortableKernel(
          graft.dedup.Dedup.shingles(col("text"), 3), 16, 4).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    assert(got.nonEmpty)
    got.foreach { case (fast, ref) => assert(fast === ref) }
  }
}
