package graft

/** Harness-only accounting: queries that stage fixtures inside their body
  * (writing the source dirs / bucketed tables / initial table loads the
  * measured operator then consumes) wrap that setup in [[timed]] so
  * [[Bench]] can report a per-query `staging_sec` next to `sec` — the
  * benchmark number should be readable as operator cost, with fixture
  * preparation visible instead of silently folded in. Verify ignores it;
  * timing accrues on the calling (driver) thread, which is where every
  * staging action blocks. */
object Staging {

  private val acc = new ThreadLocal[java.lang.Double] {
    override def initialValue(): java.lang.Double = 0.0
  }

  def reset(): Unit = acc.set(0.0)

  def elapsedSec: Double = acc.get

  def timed[A](f: => A): A = {
    val t0 = System.nanoTime()
    try f finally acc.set(acc.get + (System.nanoTime() - t0) / 1e9)
  }
}
