package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Pooled

/** The bounded-pool unordered drain primitive
  * ([[graft.util.Pooled]] — the Spark-side form of the reference's
  * BaseAsyncFunction/ThreadedExecutor async seams): multiset-exact
  * results, latency hiding ≈ poolSize, bounded in-flight window
  * (backpressure), serial-identical failure semantics, no leaked
  * worker threads. The composed seam arms (latency-injected crawl,
  * pooled lengthener) live in CrawlTopologySpec.
  */
class PooledSpec extends AnyFunSuite {

  test("emits every input exactly once (multiset), any completion order") {
    val in = (1 to 500).toVector
    val rnd = new java.util.Random(42)
    val delays = in.map(_ => rnd.nextInt(3)) // 0-2ms jitter forces reorder
    val out = Pooled.unordered(in.iterator, threads = 8, name = "spec-m") {
      i => { Thread.sleep(delays(i - 1).toLong); i * 10 }
    }.toVector
    assert(out.sorted == in.map(_ * 10),
      "pooled drain lost, duplicated, or altered elements")
  }

  test("per-partition wall ≈ Σ latencies / poolSize (the async-I/O point)") {
    // 64 items x 50ms: serial = 3.2s; pool of 16 ≈ 4 batches ≈ 0.2s.
    // Assert the pooled wall beats a quarter of serial — loose enough
    // for CI scheduling noise, impossible without real concurrency.
    val n = 64
    val perItemMs = 50L
    val t0 = System.nanoTime()
    val out = Pooled.unordered(
        (1 to n).iterator, threads = 16, name = "spec-w") { i =>
      Thread.sleep(perItemMs); i
    }.toVector
    val wallMs = (System.nanoTime() - t0) / 1000000
    assert(out.size == n)
    val serialMs = n * perItemMs
    assert(wallMs < serialMs / 4,
      s"pooled wall ${wallMs}ms did not hide latency (serial ≈ ${serialMs}ms)")
  }

  test("backpressure: in-flight never exceeds the window; input drained lazily") {
    val inFlight = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val pulled = new AtomicInteger(0)
    val in = Iterator.tabulate(200) { i => pulled.incrementAndGet(); i }
    val window = 12
    val out = Pooled.unordered(in, threads = 4, maxOutstanding = window,
        name = "spec-b") { i =>
      val cur = inFlight.incrementAndGet()
      peak.updateAndGet(p => math.max(p, cur))
      Thread.sleep(2)
      inFlight.decrementAndGet()
      i
    }
    // consume slowly: completed results pile into the window, which must
    // cap how far ahead the input iterator is pulled
    var n = 0
    var maxAhead = 0
    while (out.hasNext) {
      val _ = out.next(); n += 1
      maxAhead = math.max(maxAhead, pulled.get() - n)
    }
    assert(n == 200)
    assert(peak.get() <= 4, s"more workers than threads: ${peak.get()}")
    assert(maxAhead <= window + 1,
      s"input pulled $maxAhead ahead of consumption — window $window not enforced")
  }

  test("a throwing f fails the drain with the original exception, like serial map") {
    val it = Pooled.unordered(
        (1 to 50).iterator, threads = 4, name = "spec-e") { i =>
      if (i == 20) throw new IllegalStateException("boom-20")
      i
    }
    val e = intercept[IllegalStateException] {
      while (it.hasNext) it.next()
    }
    assert(e.getMessage == "boom-20")
    // and the failure is sticky — further hasNext rethrows, no half-drain
    intercept[IllegalStateException](it.hasNext)
  }

  test("worker threads exit after exhaustion (no leak per partition task)") {
    val tag = s"leak-${System.nanoTime()}"
    val out = Pooled.unordered(
        (1 to 40).iterator, threads = 6, name = tag)(i => i).toVector
    assert(out.size == 40)
    assert(Pooled.noLiveWorkers(tag),
      "pool threads still alive after the iterator drained")
  }

  test("a throwing drain tears the pool down (shutdownNow), not just the iterator") {
    val tag = s"fail-${System.nanoTime()}"
    val it = Pooled.unordered(
        (1 to 50).iterator, threads = 4, name = tag) { i =>
      if (i == 10) throw new IllegalStateException("die")
      Thread.sleep(5); i
    }
    intercept[IllegalStateException] { while (it.hasNext) it.next() }
    assert(Pooled.noLiveWorkers(tag),
      "pool threads still alive after a failed drain")
  }

  test("a downstream limit that abandons the iterator inside a Spark task does not leak the pool") {
    val spark = SparkTestSession.spark
    val tag = s"tasklim-${System.nanoTime()}"
    // mapPartitions drain of 500 items; take(1) abandons the iterator
    // mid-drain — the TaskContext completion listener must reap the pool
    val one = spark.sparkContext.parallelize(1 to 500, 1)
      .mapPartitions { it =>
        graft.util.Pooled.unordered(it, threads = 4, name = tag) { i =>
          Thread.sleep(2); i
        }
      }
      .take(1)
    assert(one.length == 1)
    assert(Pooled.noLiveWorkers(tag),
      "task ended but the abandoned drain's pool threads survived")
  }

  test("a driver-side abandoned drain is reclaimed by the Cleaner once unreachable") {
    val tag = s"gcleak-${System.nanoTime()}"
    def abandon(): Unit = {
      val it = Pooled.unordered(
          (1 to 1000).iterator, threads = 3, name = tag) { i =>
        Thread.sleep(1); i
      }
      it.next() // started, then dropped without exhausting
    }
    abandon()
    // the iterator is unreachable now; pump GC until the Cleaner fires
    val deadline = System.nanoTime() + 15000000000L
    while (!Pooled.noLiveWorkers(tag, timeoutMs = 200) &&
        System.nanoTime() < deadline) System.gc()
    assert(Pooled.noLiveWorkers(tag, timeoutMs = 200),
      "abandoned driver-side drain's pool was never reclaimed")
  }

  test("ordered variant preserves positional order under jittered latency") {
    val in = (1 to 100).map(i => s"k$i")
    val rnd = new java.util.Random(7)
    val out = Pooled.ordered(in, threads = 8, name = "spec-o") { s =>
      Thread.sleep(rnd.nextInt(4).toLong); s.toUpperCase
    }
    assert(out == in.map(_.toUpperCase))
  }

  test("threads <= 1 degrades to the plain serial map (deterministic order)") {
    val out = Pooled.unordered(
        (1 to 20).iterator, threads = 1, name = "spec-s")(_ * 2).toVector
    assert(out == (1 to 20).map(_ * 2).toVector)
  }
}
