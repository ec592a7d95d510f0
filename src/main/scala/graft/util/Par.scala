package graft.util

/** Run INDEPENDENT Spark actions concurrently from the driver (the
  * optimization guide's §2.6 "overlap independent jobs": actions are only
  * sequential because driver code calls them sequentially; submitting
  * independent jobs from a small pool lets one job's tasks back-fill the
  * executor slots the other job's tail leaves idle, and — the dominant
  * effect for the standing stores' small-batch commits — overlaps the two
  * jobs' fixed costs: task scheduling, parquet committer renames, fsync).
  *
  * Used where a store commit writes two key-copies of the SAME pinned
  * rows to DISJOINT directories (SignatureIndexStore sigs+bands,
  * LabelStore byid+bycomp): the writes share no state, the commit marker
  * is written by the caller only after both land, and a failure in either
  * propagates (the marker is then never written — the store protocol's
  * crash case, already handled). Spark job descriptions/groups are
  * InheritableThreadLocal, so jobs submitted from the pool keep the
  * caller's labels.
  */
object Par {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      // surface the FIRST failure with its own stack, not the wrapper's
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdownNow()
  }
}
