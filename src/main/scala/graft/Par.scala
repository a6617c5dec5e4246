package graft

/** Overlap independent Spark actions from driver threads (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — audit queries that fire a sequence of
  * INDEPENDENT gate actions (counts, collects, small writes) serialize
  * only because the driver code calls them sequentially, leaving the
  * cluster idle through each action's scheduling/planning tail.
  *
  * [[all]] runs the thunks on a bounded pool and returns their results
  * in input order, so callers' logic (and everything computed) is
  * unchanged — only the wall-clock overlap differs. Any failure
  * propagates after every thunk has settled; note that UNLIKE a
  * sequential run, thunks after a failing one still execute (they are
  * already in flight or queued), so side-effecting thunks must be
  * independent — which is the precondition for using [[all]] anyway.
  * The first-by-index failure is thrown with any other failures
  * attached as suppressed exceptions, so a multi-failure run stays
  * diagnosable.
  */
object Par {
  def all[T](thunks: Seq[() => T], parallelism: Int = 8): Seq[T] = {
    if (thunks.lengthCompare(1) <= 0) return thunks.map(_.apply())
    val n = math.min(parallelism, thunks.size)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        })
      }
      val results = futures.map(f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(e.getCause)
        })
      val failures = results.collect { case Left(e) => e }
      failures.headOption.foreach { first =>
        failures.drop(1).filter(_ ne first).foreach(first.addSuppressed)
        throw first
      }
      results.collect { case Right(v) => v }
    } finally pool.shutdown()
  }
}
