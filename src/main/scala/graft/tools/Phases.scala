package graft.tools

/**
 * Sub-query phase timing for the bench: a registered query whose fn
 * does EAGER work before returning its DataFrame (index_update's
 * build + incremental update write before the served read) records
 * those phases here, and [[graft.Bench]] drains them after each timed
 * run into BENCH_DETAIL.json — so a regression in the build half is
 * attributable without splitting the gate query (whose oracle covers
 * the whole round trip). The serve side of such a query is the
 * remainder: total − recorded phases (execution happens at the
 * bench's count(), after the fn returned).
 *
 * Recording is unconditional and a few ns; outside the bench
 * (Verify, tests) the accumulator just grows to the handful of phase
 * keys and is discarded.
 */
object Phases {
  private val acc = scala.collection.mutable.LinkedHashMap[String, Double]()

  /** Run `f`, accumulating its wall time under `name`. */
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally {
      val t = (System.nanoTime() - t0) / 1e9
      synchronized { acc(name) = acc.getOrElse(name, 0.0) + t }
    }
  }

  /** Return and clear everything recorded since the last drain. */
  def drain(): Map[String, Double] = synchronized {
    val m = acc.toMap
    acc.clear()
    m
  }
}
