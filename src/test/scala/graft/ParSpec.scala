package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.Par.par2 — the bounded §2.6 overlap helper every
  * independent-jobs optimization routes through (VERDICT r15 item 6:
  * finite await, named failure). */
class ParSpec extends AnyFunSuite {

  test("par2 returns both sides' results") {
    val (a, b) = Par.par2("spec")(() => 1 + 1, () => "x" * 3)
    assert(a == 2 && b == "xxx")
  }

  test("par2 really overlaps: both sides enter before either returns") {
    val gate = new java.util.concurrent.CountDownLatch(2)
    // each side blocks until BOTH have started — only possible when
    // the two builders run concurrently (a sequential runner deadlocks
    // here; the await bound would surface it as a named failure)
    def side(v: Int): Int = {
      gate.countDown()
      assert(gate.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "the other side never started — par2 ran sequentially")
      v
    }
    assert(Par.par2("spec-overlap")(() => side(1), () => side(2)) == ((1, 2)))
  }

  test("a throwing side propagates its failure instead of hanging") {
    val boom = intercept[Exception] {
      Par.par2("spec-fail")(
        () => throw new IllegalStateException("left side broke"),
        () => 42)
    }
    // the builder's own exception (possibly wrapped by the await)
    // must surface — never a silent hang or a swallowed error
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(5).toSeq
    assert(chain(boom).exists(_.getMessage == "left side broke"))
  }

  test("the await bound is finite and generous") {
    assert(Par.MaxWait.toMinutes >= 30,
      "bound must never fire on a legitimately slow run")
    assert(Par.MaxWait.isFinite,
      "an infinite await hangs a wedged side forever with no attribution")
  }
}
