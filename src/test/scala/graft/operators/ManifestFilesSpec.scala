package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `#files` manifest inventory (VERDICT r17 #1): full-table
  * resolution must come from recorded metadata — zero per-dir
  * filesystem listing — while every reader behavior (content,
  * partition pruning, legacy fallback, time travel, carry across
  * merge/delete/rename/compact) stays byte-identical to the
  * listing-based path. */
class ManifestFilesSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("part", "k")

  private def table(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("k", "part", "v")

  private def manifestLines(path: String): Seq[String] = {
    val dir = new java.io.File(path)
    val m = dir.listFiles().filter(_.getName.startsWith("_manifest_"))
      .maxBy(_.getName.stripPrefix("_manifest_").toInt)
    scala.io.Source.fromFile(m).getLines().toSeq
  }

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive
        .QueryStageExec => scans(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  test("merges record #files lines; the full read resolves through " +
      "ManifestFileIndex (no listing) with identical content; " +
      "partition filters prune partitions AND still filter correctly") {
    val w = java.nio.file.Files.createTempDirectory("graft_mfiles")
      .toString
    val path = s"$w/tbl"
    Upsert.mergeIntoManifested(spark, path,
      table((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0),
        (4L, "c", 4.0)).withColumn("ver", lit(1L)),
      keys, "part", "ver", retain = 6)
    Upsert.mergeIntoManifested(spark, path,
      table((3L, "b", 30.0)).withColumn("ver", lit(2L)),
      keys, "part", "ver", retain = 6)
    // one #files line per (dir, epoch) entry, with real sizes
    val lines = manifestLines(path)
    val entries = lines.filterNot(_.startsWith("#"))
    val fileLines = lines.filter(_.startsWith("#files\t"))
    assert(fileLines.size == entries.size, lines.mkString("\n"))
    assert(fileLines.forall(_.split("\t", -1).length == 4))
    assert(fileLines.forall(l => l.split("\t", -1)(3).split(",")
      .forall(f => f.substring(f.lastIndexOf(':') + 1).toLong > 0)))
    // the full read comes back from recorded metadata, not listing
    val df = Upsert.readManifested(spark, path)
    val locs = scans(df.queryExecution.executedPlan).map(_.relation.location)
    assert(locs.nonEmpty &&
      locs.forall(_.isInstanceOf[graft.sources.ManifestFileIndex]),
      locs.map(_.getClass.getName).toString)
    assert(df.as[(Long, String, Double, Long)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a", 1.0, 1L), (2L, "a", 2.0, 1L),
        (3L, "b", 30.0, 2L), (4L, "c", 4.0, 1L)))
    // a static partition filter PRUNES (the planner removes it from
    // after-scan evaluation, trusting the index) and rows are right
    val pruned = df.filter($"part" === "a")
    assert(pruned.as[(Long, String, Double, Long)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a", 1.0, 1L), (2L, "a", 2.0, 1L)))
    val counts = scans(pruned.queryExecution.executedPlan)
      .map(_.selectedPartitions.partitionCount)
    assert(counts.nonEmpty && counts.forall(_ <= 1),
      s"partition filter must prune to <=1 dir per epoch group: $counts")
    // negated / non-partition filters still correct
    assert(df.filter($"part" =!= "a" && $"v" > 3.5)
      .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
      == Seq((3L, "b", 30.0, 2L), (4L, "c", 4.0, 1L)))
  }

  test("a legacy manifest without #files lines falls back to the " +
      "listing read with the same content; time travel reads both " +
      "forms") {
    val w = java.nio.file.Files.createTempDirectory("graft_mfiles2")
      .toString
    val path = s"$w/tbl"
    Upsert.mergeIntoManifested(spark, path,
      table((1L, "a", 1.0), (2L, "b", 2.0)).withColumn("ver", lit(1L)),
      keys, "part", "ver", retain = 6)
    val before = Upsert.readManifested(spark, path)
      .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
    // strip the #files lines in place (a pre-r18 manifest)
    val m = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_manifest_")).head
    val stripped = scala.io.Source.fromFile(m).getLines()
      .filterNot(_.startsWith("#files\t")).mkString("\n") + "\n"
    java.nio.file.Files.write(m.toPath, stripped.getBytes("UTF-8"))
    // drop the Hadoop local-fs checksum sidecar the out-of-band edit
    // just invalidated
    new java.io.File(m.getParentFile, s".${m.getName}.crc").delete()
    val df = Upsert.readManifested(spark, path)
    assert(scans(df.queryExecution.executedPlan).map(_.relation.location)
      .forall(!_.isInstanceOf[graft.sources.ManifestFileIndex]))
    assert(df.as[(Long, String, Double, Long)].collect().sortBy(_._1)
      .toSeq == before)
    // a subsequent merge re-records inventories for what it can see
    Upsert.mergeIntoManifested(spark, path,
      table((3L, "c", 3.0)).withColumn("ver", lit(2L)),
      keys, "part", "ver", retain = 6)
    val lines = manifestLines(path)
    // only the fresh epoch's dir has a record (nothing re-lists the
    // legacy mass); readers mix recorded and listed groups freely
    assert(lines.count(_.startsWith("#files\t")) == 1, lines.toString)
    assert(Upsert.readManifested(spark, path).count() == 3)
    // time travel: epoch 0 (legacy form) and epoch 1 (mixed) both read
    assert(Upsert.readManifestedAt(spark, path, 0).count() == 2)
    assert(Upsert.readManifestedAt(spark, path, 1).count() == 3)
  }

  test("deletes, compaction, rename and drop keep inventories in step " +
      "with entries; changesBetween and the CDF ride them") {
    val w = java.nio.file.Files.createTempDirectory("graft_mfiles3")
      .toString
    val path = s"$w/tbl"
    Upsert.mergeIntoManifested(spark, path,
      table((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
        .withColumn("ver", lit(1L)), keys, "part", "ver", retain = 8)
    // delete key 2: partition b drops out entirely; a and c carry
    Upsert.deleteKeysFromManifested(spark, path,
      Seq((2L, "b")).toDF("k", "part").select($"part", $"k"),
      keys, "part", retain = 8)
    def check(path: String): Unit = {
      val lines = manifestLines(path)
      val entries = lines.filterNot(_.startsWith("#"))
        .map { l => val i = l.lastIndexOf('\t')
          (l.substring(0, i), l.substring(i + 1).toLong) }.toSet
      val recs = lines.filter(_.startsWith("#files\t")).map { l =>
        val a = l.split("\t", -1); (a(1), a(2).toLong) }.toSet
      assert(recs == entries, s"inventories out of step with entries:" +
        s"\n$recs\nvs\n$entries")
    }
    check(path)
    assert(Upsert.readManifested(spark, path).count() == 2)
    // metadata-only rename and drop carry inventories verbatim
    Upsert.renameManifestedColumn(spark, path, "v", "w", retain = 8)
    check(path)
    Upsert.mergeIntoManifested(spark, path,
      Seq((4L, "a", 9.0, 2L)).toDF("k", "part", "w", "ver"),
      keys, "part", "ver", retain = 8)
    check(path)
    // the feed diff reads both endpoint manifests through the records
    val feed = Upsert.changesBetween(spark, path, 2L, 3L, keys)
    assert(feed.filter($"_change_type" === "insert")
      .select($"k").as[Long].collect().toSeq == Seq(4L))
    // compaction rewrites everything and records the fresh epoch
    Upsert.compactManifested(spark, path, "part", retain = 8)
    check(path)
    assert(Upsert.readManifested(spark, path).count() == 3)
    val df = Upsert.readManifested(spark, path)
    assert(scans(df.queryExecution.executedPlan).map(_.relation.location)
      .forall(_.isInstanceOf[graft.sources.ManifestFileIndex]))
  }
}
