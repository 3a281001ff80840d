package graft.pipeline

import graft.SparkSpec
import graft.sources.Http
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ExportHttpSpec extends SparkSpec {
  import spark.implicits._

  test("writeChunked bounds records per file; chunks reassemble to the original (O1)") {
    val df = spark.range(0, 2000).toDF("id")
    val out = Files.createTempDirectory("graft_chunks").toString
    Export.writeChunked(df.repartition(2), out, maxRecordsPerFile = 300)
    val files = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 7) // 2000/300 rounded up, per-task rolling
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 300, s"${f.getName} has $n rows")
    }
    // round-trip: union of chunks == original (SURVEY §5 property)
    val back = spark.read.parquet(out).as[Long].collect().sorted
    assert(back.toSeq == (0L until 2000L))
  }

  test("writeDatePartitioned lays out partition dirs and prunes (S2)") {
    val df = Seq(("2026-01-01 10:00:00", 1), ("2026-01-02 11:00:00", 2))
      .toDF("ts", "v").withColumn("ts", $"ts".cast("timestamp"))
    val out = Files.createTempDirectory("graft_datep").toString
    Export.writeDatePartitioned(df, out, "ts")
    assert(new java.io.File(s"$out/ingest_date=2026-01-01").exists())
    val pruned = spark.read.parquet(out)
      .filter($"ingest_date" === "2026-01-02")
    assert(pruned.select("v").as[Int].collect().toSeq == Seq(2))
  }

  test("Http.fetchToStaging lands a file under the date dir (S1, file URL)") {
    val src = Files.createTempFile("graft_src", ".csv")
    Files.writeString(src, "a,b\n1,2\n")
    val staging = Files.createTempDirectory("graft_staging").toString
    val landed = Http.fetchToStaging(src.toUri.toString, staging, "2026-08-12")
    assert(landed.endsWith(s"2026-08-12/${src.getFileName}"))
    assert(Files.readString(java.nio.file.Paths.get(landed)) == "a,b\n1,2\n")
  }

  test("checkRemainingFiles: loaded files drop out, stale files classified (ST4/ST5)") {
    val in = Files.createTempDirectory("graft_rem")
    val wh = Files.createTempDirectory("graft_rem_wh")
    val p = new IngestPipeline(spark, wh.toString)
    Files.writeString(in.resolve("f1.csv"), "x")
    Files.writeString(in.resolve("f2.csv"), "x")
    Files.writeString(in.resolve("converted_f1.csv"), "x")
    val now = System.currentTimeMillis()
    // f1 recorded as loaded; f2 fresh -> pending
    p.audit.append("loading", "f1.csv", 1, now)
    val r1 = p.checkRemainingFiles(in.toString, 30, now)
    assert(r1.pending == Seq("f2.csv") && r1.stale.isEmpty && !r1.done)
    // far-future "now" makes f2 stale -> done (no pending)
    val r2 = p.checkRemainingFiles(in.toString, 30, now + 3600L * 1000000)
    assert(r2.pending.isEmpty && r2.stale == Seq("f2.csv") && r2.done)
  }
}
