package graft.util

import java.util.concurrent.{ExecutorCompletionService, Executors, ThreadFactory, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Bounded-pool unordered-completion drain for network-bound
  * `mapPartitions` seams — the Spark analogue of the reference's async
  * operators (…/flinkcrawler/functions/BaseAsyncFunction.java:23-42 over
  * utils/ThreadedExecutor.java:50-67, consumed with
  * `AsyncDataStream.unorderedWait`, CrawlTopologyBuilder.java:379-385).
  *
  * Why: a serial `it.map(fetch)` makes per-partition wall time the SUM of
  * request latencies, capping crawl concurrency at the task-slot count.
  * The reference runs robots checks on 10 threads
  * (CheckUrlWithRobotsFunction.java:52), page fetches on the fetcher's
  * configured concurrency, and the lengthener on 100 threads
  * (LengthenUrlsFunction.java:21). This helper restores that design:
  * per-partition wall ≈ Σ latencies / poolSize.
  *
  * Semantics:
  *   - results are emitted in COMPLETION order (the reference consumes
  *     its async operators unordered; nothing downstream of any seam
  *     assumes input order — verdict filters, groupBys, journals).
  *   - backpressure: at most `maxOutstanding` items are submitted but not
  *     yet consumed (in-flight + completed-in-queue). The draining thread
  *     blocks on the next completion once the window is full — the same
  *     no-unbounded-queue guarantee as ThreadedExecutor's blocking
  *     `offer` (java:50-67), with the window also bounding result memory
  *     (page bodies buffer at most `maxOutstanding` at a time; the
  *     reference's analogous knob is the async-wait capacity of 10 000).
  *   - an exception from `f` fails the drain (rethrown with its original
  *     type) exactly like the serial `it.map(f)` would fail the task;
  *     the pool is torn down. Callers that must never fail wrap their
  *     work (Fetcher.safeFetch) just as they did serially.
  *   - the pool is a daemon-thread fixed pool, shut down on exhaustion
  *     AND on task completion/failure (TaskContext listener), so a
  *     downstream `limit(n)` that abandons the iterator cannot leak
  *     threads.
  *
  * `threads <= 1` degrades to the plain serial map (zero overhead, and
  * the deterministic path for tests that need ordering).
  */
object Pooled {

  private val poolSeq = new AtomicInteger(0)

  // driver-side leak guard: outside a Spark task there is no TaskContext
  // listener, so an ABANDONED drain (caller stops consuming early) would
  // pin its worker threads for the JVM's life. The Cleaner reclaims the
  // pool once the iterator is unreachable; registered per-drain, fires
  // only when neither exhaustion nor the task listener already shut the
  // pool down.
  private val cleaner = java.lang.ref.Cleaner.create(
    daemonFactory("cleaner"))

  private def daemonFactory(name: String): ThreadFactory = new ThreadFactory {
    private val n = new AtomicInteger(0)
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-pooled-$name-${n.getAndIncrement()}")
      t.setDaemon(true)
      t
    }
  }

  /** Drain `it` through a bounded pool of `threads` workers applying `f`,
    * emitting results in completion order. At most `maxOutstanding`
    * (default 4×threads) items are in flight at once.
    */
  def unordered[A, B](
      it: Iterator[A],
      threads: Int,
      maxOutstanding: Int = 0,
      name: String = "io")(f: A => B): Iterator[B] = {
    if (threads <= 1) return it.map(f)
    val window = if (maxOutstanding > 0) maxOutstanding else threads * 4
    val pool = Executors.newFixedThreadPool(
      threads, daemonFactory(s"$name-${poolSeq.getAndIncrement()}"))
    val ecs = new ExecutorCompletionService[B](pool)

    // a killed task or an abandoned iterator (downstream limit) must not
    // leak the pool for the executor JVM's life
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => pool.shutdownNow())

    val out = new Iterator[B] {
      private var inFlight = 0
      private var failed: Throwable = null

      private def refill(): Unit =
        while (failed == null && inFlight < window && it.hasNext) {
          val a = it.next()
          ecs.submit(() => f(a))
          inFlight += 1
        }

      refill()

      override def hasNext: Boolean = {
        if (failed != null) throw failed
        if (inFlight > 0) true
        else { pool.shutdown(); false }
      }

      override def next(): B = {
        if (!hasNext) throw new NoSuchElementException("drained")
        val fut = ecs.take()
        inFlight -= 1
        val r =
          try fut.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              // fail like the serial map would: original exception type,
              // remaining work cancelled
              failed = if (e.getCause != null) e.getCause else e
              pool.shutdownNow()
              throw failed
          }
        refill()
        r
      }
    }
    // the cleanup action must not capture `out` (it would never become
    // unreachable) — `pool` alone is enough
    cleaner.register(out, () => pool.shutdownNow())
    out
  }

  /** Order-preserving variant for callers that zip results positionally
    * (e.g. CDX shard-header reads): same pool, same backpressure, results
    * reassembled by index. Buffers out-of-order completions, so intended
    * for bounded driver-side lists, not unbounded partitions.
    */
  def ordered[A, B](
      items: Seq[A],
      threads: Int,
      name: String = "io")(f: A => B): Seq[B] =
    unordered(items.iterator.zipWithIndex, threads, name = name) {
      case (a, i) => (i, f(a))
    }.toSeq.sortBy(_._1).map(_._2)

  /** Await helper used by tests: true once no live thread carries the
    * given pool-name prefix (daemon workers exit after shutdown).
    */
  def noLiveWorkers(namePrefix: String, timeoutMs: Long = 5000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def live(): Boolean = {
      val all = new Array[Thread](Thread.activeCount() + 8)
      val n = Thread.enumerate(all)
      all.take(n).exists(t =>
        t != null && t.isAlive && t.getName.startsWith(s"graft-pooled-$namePrefix"))
    }
    while (live() && System.nanoTime() < deadline) Thread.sleep(10)
    !live()
  }
}
