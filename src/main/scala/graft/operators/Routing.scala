package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P3-P10 (SURVEY §2.2): the reference's validation/routing predicates,
  * re-expressed as `Column` predicates so Catalyst pushes them into scans.
  *
  * The reference dispatches S3 events by event-name substring, bucket,
  * filename extension and freshness (`2.1 leader-lambda-for-mysql.py:
  * 147-187,278-305`; `2.2 loading-lambda-for-mysql.py:596-620`); here the
  * same predicates operate over any frame carrying the equivalent columns.
  */
object Routing {

  /** P3: only object-created events are processed. */
  def isObjectCreated(eventName: Column): Column =
    eventName.contains("ObjectCreated:")

  /** P4: extension-based routing (csv/txt → etl, sql → init, else drop). */
  def extension(key: Column): Column =
    lower(element_at(split(key, "\\."), -1))

  def route(bucket: Column, key: Column): Column = {
    val ext = extension(key)
    when(bucket.contains("backup") && ext === "sql", "init")
      .when(bucket.contains("upload") && ext.isin("csv", "txt"), "etl")
      .otherwise("drop")
  }

  /** P5: freshness window — rows whose mtime is within `minutes` of `now`. */
  def isFresh(mtime: Column, now: Column, minutes: Int): Column =
    (unix_timestamp(now) - unix_timestamp(mtime)) < minutes * 60L

  /** P9/P10: the reference's audit-log probe —
    * `locate('x',EventSource)>0 and timediff(now(),ts)<10`. */
  def recentLogMatch(eventSource: Column, ts: Column, now: Column,
                     needle: String, seconds: Int): Column =
    (instr(eventSource, needle) > 0) &&
      (unix_timestamp(now) - unix_timestamp(ts) < seconds.toLong)

  /** ST9: re-entrancy guard — derived files are never re-consumed. */
  def notDerived(key: Column): Column = !key.contains("converted")
}
