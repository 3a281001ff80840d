package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-gate job-level profiler (optimization guide §1: measure first).
  *
  * Runs the named gates once to warm (JIT, artifact builds, parquet
  * footers), then once instrumented, and prints for the timed run:
  *   - every Spark job: wall, #tasks, executor cpu/run time, callsite
  *   - the DRIVER GAP: wall spent with zero jobs running (planning,
  *     FS metadata, manifest parsing, commit protocol)
  * which is exactly the split the optimization round needs: executor
  * time responds to plan shape (shuffles, joins, codegen); gap time
  * responds to driver-side work (listing, publish, per-action fixed
  * overhead) that no plan change can touch.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.GateProfile x_stream_mv x_dedup_ngram"
  */
object GateProfile {
  final case class JobRec(id: Int, submitted: Long, var finished: Long,
                          var tasks: Int, desc: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    @volatile var taskTimeMs = 0L
    @volatile var cpuTimeMs = 0L
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (recording) {
        if (sys.env.contains("SPARK_GRAFT_PROFILE_PROPS"))
          Option(js.properties).foreach { p =>
            val it = p.stringPropertyNames().iterator()
            val sb = new StringBuilder(s"[props job ${js.jobId}]")
            while (it.hasNext) { val k = it.next(); sb ++= s" $k=${p.getProperty(k).take(80)};" }
            System.err.println(sb.toString)
          }
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.long"))
              .map(_.linesIterator
                .find(l => l.contains("graft") && !l.contains("GateProfile"))
                .getOrElse(p.getProperty("callSite.short", "?")))))
          .getOrElse("?")
        jobs.put(js.jobId, JobRec(js.jobId, js.time, 0L, 0, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (recording) {
        Option(jobs.get(je.jobId)).foreach(_.finished = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (recording) {
          taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
          cpuTimeMs += sc.stageInfo.taskMetrics.executorCpuTime / 1000000L
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val names =
      if (args.nonEmpty) args.toSeq
      else sys.env.get("SPARK_GRAFT_PROFILE_ONLY").toSeq
        .flatMap(_.split(",").map(_.trim))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown gate $name"))
      // warm run: cold JIT + artifact builds land here, not in the report
      try fn(spark, sfDir).count()
      catch { case t: Throwable =>
        System.err.println(s"[profile] warm run of $name threw: $t") }
      spark.catalog.clearCache()
      jobs.clear(); taskTimeMs = 0L; cpuTimeMs = 0L
      recording = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      // drain listener events before reading the recording (the bus is
      // private[spark]; a short sleep suffices for a profiling tool)
      Thread.sleep(300)
      recording = false
      spark.catalog.clearCache()
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.submitted)
      // union of job intervals = wall with >=1 job in flight
      val iv = recs.filter(_.finished > 0)
        .map(r => (r.submitted, r.finished)).sortBy(_._1)
      var covered = 0L; var curS = -1L; var curE = -1L
      iv.foreach { case (s0, e0) =>
        if (curE < 0) { curS = s0; curE = e0 }
        else if (s0 <= curE) { curE = math.max(curE, e0) }
        else { covered += curE - curS; curS = s0; curE = e0 }
      }
      if (curE >= 0) covered += curE - curS
      println(f"== $name%s wall=${wallMs / 1000.0}%.3fs jobs=${recs.size}%d " +
        f"jobWall=${covered / 1000.0}%.3fs driverGap=${(wallMs - covered) / 1000.0}%.3fs " +
        f"taskTime=${taskTimeMs / 1000.0}%.3fs cpuTime=${cpuTimeMs / 1000.0}%.3fs")
      val byDesc = recs.groupBy(_.desc).map { case (d, rs) =>
        (d, rs.size, rs.map(r => math.max(0L, r.finished - r.submitted)).sum)
      }.toSeq.sortBy(-_._3)
      byDesc.take(30).foreach { case (d, n, ms) =>
        println(f"   ${ms / 1000.0}%8.3fs  n=$n%-4d $d%s")
      }
    }
    spark.stop()
  }
}
