package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** The audit window probe's bounded-read contract: checkStatus must
  * answer from files young enough to hold in-window rows (every append
  * writes AFTER its event, so file mtime >= row ts) — old audit files
  * accumulate forever and must never be re-opened by a window probe
  * (VERDICT r13 #3: the unbounded scan made every redelivery check
  * O(total stages ever)). */
class AuditLogSpec extends SparkSpec {

  test("checkStatus answers correctly with aged-out files present " +
      "and prunes them by mtime") {
    val dir = Files.createTempDirectory("graft_audit").toString
    val audit = new AuditLog(spark, dir)
    val now = System.currentTimeMillis()
    // an OLD success (2h ago), then physically backdate its file so the
    // layout is what a long-lived audit dir looks like
    audit.append("loading", "f_old", 1, now - 7200 * 1000L)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).foreach { st =>
      if (st.isFile) fs.setTimes(st.getPath, now - 7200 * 1000L, -1)
    }
    // a recent success in a fresh (current-mtime) file
    audit.append("loading", "f_new", 1, now)

    // old file is outside the window: pruned without being read
    assert(audit.checkStatus("loading", "f_old", 1800, now,
      exact = true) == 0)
    // recent row still found through the bounded read
    assert(audit.checkStatus("loading", "f_new", 1800, now,
      exact = true) == 1)
    // a window wide enough to cover the old file reads it again
    assert(audit.checkStatus("loading", "f_old", 8000, now,
      exact = true) == 1)
    // non-window probes still see full history
    assert(audit.countFailures("f_old") == 0)
    assert(audit.table().count() == 2)
  }

  test("degraded mtime fidelity falls back to the unpruned scan " +
      "instead of a false negative (ADVICE r14)") {
    val dir = Files.createTempDirectory("graft_audit_mt").toString
    val audit = new AuditLog(spark, dir)
    val now = System.currentTimeMillis()
    // an IN-WINDOW success whose file mtime lies far in the past —
    // the restored/rsynced-artifact-dir shape where mtime does not
    // track write completion
    audit.append("loading", "f_x", 1, now - 60 * 1000L)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).foreach { st =>
      if (st.isFile) fs.setTimes(st.getPath, now - 86400 * 1000L, -1)
    }
    // the pruned listing finds nothing in-window, but the dir is
    // non-empty: the fallback full read finds the row by its ts —
    // a suppression probe must NOT re-admit already-succeeded work
    assert(audit.checkStatus("loading", "f_x", 1800, now,
      exact = true) == 1)
    // the slack knob widens the pruning window without the fallback
    val wide = new AuditLog(spark, dir, mtimeSlackSeconds = 2 * 86400L)
    assert(wide.checkStatus("loading", "f_x", 1800, now,
      exact = true) == 1)
  }

  test("MIXED mtime fidelity: fresh files present AND the in-window row " +
      "in a backdated file — fallback still finds it (ADVICE r15)") {
    val dir = Files.createTempDirectory("graft_audit_mx").toString
    val audit = new AuditLog(spark, dir)
    val now = System.currentTimeMillis()
    // the row that matters, in a file whose mtime lies (restored file)
    audit.append("loading", "f_restored", 1, now - 60 * 1000L)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).foreach { st =>
      if (st.isFile) fs.setTimes(st.getPath, now - 86400 * 1000L, -1)
    }
    // an unrelated FRESH file keeps the pruned set non-empty — the r14
    // zero-in-window fallback trigger never fires; the r15 miss-driven
    // fallback must
    audit.append("loading", "f_other", 1, now)
    assert(audit.checkStatus("loading", "f_restored", 1800, now,
      exact = true) == 1)
    // and a genuinely absent target still answers 0 through both passes
    assert(audit.checkStatus("loading", "f_never", 1800, now,
      exact = true) == 0)
  }
}
