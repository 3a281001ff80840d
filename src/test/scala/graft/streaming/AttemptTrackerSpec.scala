package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class AttemptTrackerSpec extends SparkSpec {
  import spark.implicits._
  import AttemptTracker._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("attempt counter quarantines after maxAttempts, resets on success") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Outcome]
    val q = track(mem.toDS(), maxAttempts = 3)
      .writeStream.format("memory").queryName("attempts")
      .outputMode("append").start()

    mem.addData(
      Outcome("a.csv", success = false, ts(1)),
      Outcome("a.csv", success = false, ts(2)),
      Outcome("b.csv", success = false, ts(1)))
    q.processAllAvailable()
    mem.addData(
      Outcome("a.csv", success = false, ts(3)), // 3rd failure -> quarantine
      Outcome("b.csv", success = true, ts(2)))  // recovers
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attempts").as[Decision].collect()
      .groupBy(_.key).view.mapValues(_.sortBy(_.attempts)).toMap
    assert(rows("a.csv").map(_.action).toSeq ==
      Seq("retry", "retry", "quarantine"))
    assert(rows("b.csv").map(d => (d.attempts, d.action)).toSet ==
      Set((1, "retry"), (0, "recovered")))
  }
}
