package graft.util

/** Opt-in wall-clock stage attribution for the composite store-lifecycle
  * queries (q101/q109/q115/q116/q117 run several store commits plus a
  * read inside ONE timed query — 20+ s of the sf0.1 suite). Disabled by
  * default (Verify and production paths pay one volatile read); Bench
  * enables it and drains per query, so `target/bench-<sf>.json` carries
  * a per-stage breakdown and a lifecycle-gate regression is attributable
  * to append/retire/compact/read without a bisect.
  *
  * Driver-side only by design: stages bracket eager store operations
  * (write jobs), not executor-side code.
  */
object StageTimer {

  @volatile var enabled = false

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  /** Time `body` under `stage` when enabled; transparent otherwise. */
  def time[T](stage: String)(body: => T): T =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      try body
      finally buf.add(stage -> (System.nanoTime() - t0) / 1e9)
    }

  /** Stages recorded since the last drain, in record order. */
  def drain(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var e = buf.poll()
    while (e != null) { out += e; e = buf.poll() }
    out.toSeq
  }
}
