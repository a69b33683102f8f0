package graft

/** Driver-side overlap of INDEPENDENT Spark actions (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — actions are only sequential because the
  * driver calls them sequentially. Used for the eager cache warm-ups
  * the r15 persist work introduced (d51/d53's truth+candidate counts,
  * a55's per-grid-point encode passes): each thunk materializes a
  * DISTINCT persisted frame, so there is no cold-cache race between
  * them, and overlapping them lets a small job back-fill the executor
  * tail of a large one instead of waiting for it.
  *
  * Results come back in input order. Any thunk failure rethrows
  * (Await propagates the first), preserving fail-stop semantics. The
  * pool is bounded (default 4 in flight — enough to fill a stage
  * tail, not so many that jobs fight for task slots) and torn down
  * before returning, so no thread leaks across invocations. */
private[graft] object Par {
  def run[T](thunks: Seq[() => T], maxInFlight: Int = 4): Seq[T] =
    if (thunks.size <= 1) thunks.map(_())
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(thunks.size, maxInFlight))
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      try Await.result(
        Future.sequence(thunks.map(t => Future(t()))), Duration.Inf)
      finally pool.shutdown()
    }
}
