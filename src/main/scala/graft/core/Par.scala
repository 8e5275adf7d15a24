package graft.core

/** Run independent Spark ACTIONS concurrently from driver threads —
  * the standard trick for index builds that land several artifacts
  * (postings + stats, centroids + codebooks + codes): the scheduler
  * interleaves the jobs' stages, so wall time approaches the longest
  * branch instead of the sum, and the per-action fixed costs (plan,
  * commit protocol) overlap. Each call uses its own bounded pool and
  * tears it down; the first failing branch rethrows after all branches
  * settle (no half-awaited pool leak).
  */
object Par {
  def run(tasks: (() => Unit)*): Unit = {
    require(tasks.nonEmpty, "no tasks")
    if (tasks.size == 1) { tasks.head(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futures = tasks.map(t => pool.submit(new Runnable {
        override def run(): Unit = t()
      }))
      var firstFailure: Throwable = null
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure == null) firstFailure = e.getCause
        }
      }
      if (firstFailure != null) throw firstFailure
    } finally pool.shutdown()
  }
}
