package graft.streaming

/** EP1 notification protocol: the reference publishes every pipeline
  * outcome to a success or a failure topic (`notify(status, subject,
  * body)` with `topic_arn_on_success` / `topic_arn_on_failure`,
  * `2.2 loading-lambda-for-mysql.py:694-714`). The engine keeps the same
  * two-channel {1 success, 0 failure} shape as a callback interface: the
  * host wires it to whatever bus it runs on (a queue producer, a logger,
  * a test recorder) — the engine itself stays transport-free.
  *
  * Control-plane: one call per pipeline outcome, never per row.
  */
trait Notifier {
  /** status 1 = success channel, 0 = failure channel (reference codes). */
  def notify(status: Int, subject: String, body: String): Unit

  final def success(subject: String, body: String = ""): Unit =
    notify(1, Notifier.sanitizeSubject(subject), body)
  final def failure(subject: String, body: String = ""): Unit =
    notify(0, Notifier.sanitizeSubject(subject), body)
}

object Notifier {
  /** The reference's subject rule: Unicode control/format chars stripped,
    * capped at 99 chars (`R22:703`) — message-bus subject limits. */
  def sanitizeSubject(s: String): String =
    s.filter(ch => Character.getType(ch) match {
      case Character.CONTROL | Character.FORMAT | Character.PRIVATE_USE |
           Character.SURROGATE | Character.UNASSIGNED => false
      case _ => true
    }).take(99)

  /** Default no-op sink. */
  val noop: Notifier = (_, _, _) => ()
}
