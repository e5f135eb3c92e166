package graft

/** Driver-side job overlap (guide §2.6): Spark's scheduler runs several
  * jobs at once inside one application — actions are only sequential
  * because driver code calls them sequentially. `run` submits
  * independent tasks on a short-lived pool and propagates the first
  * failure unwrapped. Use ONLY for tasks with no ordering dependency
  * (disjoint store directories, independent materializations); never
  * to reorder a store's batch sequence. */
private[graft] object Par {
  def run[T](tasks: (() => T)*): Seq[T] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map(t => pool.submit(new java.util.concurrent.Callable[T] {
        override def call(): T = t()
      }))
      futs.map { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdown()
  }
}
