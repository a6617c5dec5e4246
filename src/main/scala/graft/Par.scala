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
  * propagates after every thunk has settled (a gate's exception must
  * surface exactly as it would have sequentially, not kill the pool
  * mid-flight).
  */
object Par {
  def all[T](thunks: Seq[() => T], parallelism: Int = 8): Seq[T] = {
    if (thunks.lengthCompare(1) <= 0) return thunks.map(_.apply())
    val n = math.min(parallelism, thunks.size)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      import scala.jdk.CollectionConverters._
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
      results.collectFirst { case Left(e) => e }.foreach(throw _)
      results.collect { case Right(v) => v }
    } finally pool.shutdown()
  }
}
