package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Path}

class NotifierSpec extends SparkSpec {

  private val header =
    "Date,GEO,DGUID,Products,UOM,UOM_ID,SCALAR_FACTOR,SCALAR_ID,VECTOR,COORDINATE,VALUE,STATUS,SYMBOL,TERMINATED,DECIMALS"
  private def row(date: String, geo: String, v: String) =
    s"$date,$geo,2016A0001,food,Units,300,units,0,v123,1.1.1,$v,,,,1"

  private def tmp(p: String): Path = {
    val d = Files.createTempDirectory(p); d.toFile.deleteOnExit(); d
  }

  /** Thread-safe recording sink. */
  private final class Recorder extends Notifier {
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String)]
    override def notify(status: Int, subject: String, body: String): Unit =
      calls.add((status, subject, body))
    def byStatus(s: Int): Seq[(Int, String, String)] = {
      import scala.jdk.CollectionConverters._
      calls.asScala.filter(_._1 == s).toSeq
    }
  }

  test("subject sanitation: control chars stripped, 99-char cap (R22:703)") {
    val s = Notifier.sanitizeSubject("a\tb\nc\u0000d" + "x" * 200)
    assert(s.startsWith("abcd"))
    assert(s.length == 99)
    assert(!s.exists(_.isControl))
  }

  test("EP1 channels: failure on every failed attempt + quarantine, success on drain") {
    val in = tmp("graft_ntf_in"); val wh = tmp("graft_ntf_wh")
    val ck = tmp("graft_ntf_ck")
    Files.writeString(in.resolve("priceindex_good.csv"),
      Seq(header, row("1995-12", "Canada", "104.3")).mkString("\n"))
    Files.writeString(in.resolve("priceindex_poison.csv"),
      (Seq(header) ++ (1 to 9).map(_ => "bad,row")).mkString("\n"))

    val rec = new Recorder
    val watch = new Watch(spark, in.toString, wh.toString,
      maxAttempts = 2, freshnessMinutes = 0, notifier = rec)
    (1 to 2).foreach { _ =>
      val q = watch.start(ck.toString)
      try q.awaitTermination(120000)
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    }
    val failures = rec.byStatus(0)
    // attempt 1 -> "load failed", attempt 2 -> "quarantined"
    assert(failures.exists(_._2.contains("load failed for priceindex_poison.csv")),
      failures.toString)
    assert(failures.exists(_._2.contains("quarantined priceindex_poison.csv")),
      failures.toString)
    // freshnessMinutes=0 diverts the leftover poison file to stale, so
    // the drained-backlog success notification fires
    assert(rec.byStatus(1).exists(_._2.startsWith("all files loaded")),
      rec.calls.toString)
  }

  test("report export notifies the success channel") {
    val wh = tmp("graft_ntf_rep_wh"); val out = tmp("graft_ntf_rep_out")
    val rec = new Recorder
    val pipe = new graft.pipeline.IngestPipeline(spark, wh.toString,
      notifier = rec)
    val csv = wh.resolve("priceindex_r.csv")
    Files.writeString(csv,
      Seq(header, row("1996-03", "Canada", "101.0")).mkString("\n"))
    assert(pipe.load(csv.toString).status == 1)
    pipe.buildAndExportReport(1996, 3, Seq("Canada"), "", s"$out/report")
    assert(rec.byStatus(1).exists(_._2.contains("report 1996-3 exported")),
      rec.calls.toString)
  }
}
