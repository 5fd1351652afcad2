package graft

/** Run two independent EAGER builders concurrently and return both
  * (optimization guide §2.6 — overlap independent jobs): an iterative
  * loop or an artifact write is a chain of driver-synchronous jobs
  * whose scheduling gaps the other side's tasks back-fill. Only for
  * builders with no data dependency; determinism is untouched (each
  * side is a self-contained deterministic computation, and they only
  * meet after both complete).
  *
  * The await is FINITE and the failure NAMED (VERDICT r15 item 6): a
  * wedged side must surface as an attributed error, never an eternal
  * hang. The bound is generous — hours, far beyond any legitimate run
  * of the callers — because its job is attribution, not pacing.
  */
object Par {
  import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
  import scala.concurrent.duration._

  private[graft] val MaxWait: FiniteDuration = 2.hours

  def par2[A, B](name: String)(fa: () => A, fb: () => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val a = Future(fa()); val b = Future(fb())
      def waitFor[T](f: Future[T], side: String): T =
        try Await.result(f, MaxWait)
        catch {
          case e: TimeoutException => throw new RuntimeException(
            s"$name: $side side produced no result within $MaxWait", e)
        }
      (waitFor(a, "first"), waitFor(b, "second"))
    } finally pool.shutdown()
  }
}
