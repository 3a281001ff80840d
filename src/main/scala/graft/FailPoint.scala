package graft

/** Test-only crash injection for chaos specs (VERDICT r12 next-list
  * #6). [[FailPoint.Kill]] extends Error, so operator/pipeline code
  * catching `Exception` does NOT see it — no failure handling runs,
  * and durable state is left EXACTLY as a process kill at that site
  * would leave it. Disarmed (the default) each hit() is a single
  * volatile read. */
object FailPoint {
  @volatile private var armed: String = null
  def arm(site: String): Unit = armed = site
  def disarm(): Unit = armed = null
  def hit(site: String): Unit =
    if (armed != null && armed == site) { armed = null; throw new Kill(site) }

  final class Kill(site: String) extends Error(s"injected kill at $site")
}
