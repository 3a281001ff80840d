package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST6 (SURVEY §2.9) as a first-class stateful streaming operator: the
  * reference's poison-message protocol — a file failing repeatedly goes
  * to the DLQ with an alarm (`2.2 loading-lambda-for-mysql.py:327-331`)
  * — implemented with `flatMapGroupsWithState`, the Spark-native home
  * for per-key custom state (attempt counters survive in the state
  * store across micro-batches and restarts, unlike driver-side maps).
  *
  * Input: a stream (or batch frame) of load outcomes
  * `(key, success, ts)`. Output: one decision row per transition —
  * `retry` while attempts < maxAttempts, `quarantine` once reached,
  * `recovered` on success.
  *
  * NOTE on state TTL: production would bound state with
  * `GroupStateTimeout.ProcessingTimeTimeout` + `setTimeoutDuration`;
  * in this container that combination makes the state-store snapshot
  * coordinator spin ("state stores falling behind") and the batch never
  * completes, so the tracker runs with NoTimeout and relies on the
  * `recovered` reset to keep per-key state at one counter.
  */
object AttemptTracker {

  final case class Outcome(key: String, success: Boolean, ts: Timestamp)
  final case class Attempts(n: Int)
  final case class Decision(key: String, attempts: Int, action: String)

  def track(outcomes: Dataset[Outcome],
            maxAttempts: Int): Dataset[Decision] = {
    val spark = outcomes.sparkSession
    implicit val decEnc = Encoders.product[Decision]
    implicit val attEnc = Encoders.product[Attempts]
    implicit val strEnc = Encoders.STRING

    outcomes.groupByKey(_.key)
      .flatMapGroupsWithState[Attempts, Decision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Outcome], state: GroupState[Attempts]) =>
          var n = state.getOption.map(_.n).getOrElse(0)
          val out = rows.toSeq.sortBy(_.ts.getTime).flatMap { o =>
            if (o.success) {
              val had = n
              n = 0
              if (had > 0) Seq(Decision(key, 0, "recovered")) else Nil
            } else {
              n += 1
              Seq(Decision(key, n,
                if (n >= maxAttempts) "quarantine" else "retry"))
            }
          }
          state.update(Attempts(n))
          out.iterator
      }
  }

  /** Convenience: wrap an untyped (key, success, ts) frame. */
  def trackDF(df: DataFrame, maxAttempts: Int): Dataset[Decision] = {
    implicit val enc = Encoders.product[Outcome]
    track(df.toDF("key", "success", "ts").as[Outcome], maxAttempts)
  }
}
