package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = {
    val rnd = new scala.util.Random(11)
    (1 to 80).map { i =>
      val base = if (i <= 40) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
  }
  private val query = Seq(10.0, 0.3, 0.0, 0.0)

  test("index search equals the scan-based lshTopK (same planes)") {
    val base = Files.createTempDirectory("graft_lsh").toString
    val idx = new LshIndex(spark, base, dim = 4, numTables = 6,
      bitsPerTable = 2, seed = 7L)
    idx.build(emb, "vec_id", "embedding")
    val viaIndex = idx.search("vec_id", "embedding", query, k = 5)
      .as[(Long, Double)].collect().toSeq
    val planes = Similarity.hyperplanes(4, 6, 2, 7L)
    val viaScan = Similarity.lshTopK(emb, "vec_id", "embedding", query, 5, planes)
      .as[(Long, Double)].collect().toSeq
    assert(viaIndex == viaScan)
    assert(viaIndex.nonEmpty && viaIndex.head._1 <= 40) // cluster-0 hit
  }

  test("multiprobe: probes=1 equals plain search; extra probes only widen the candidate set") {
    val base = Files.createTempDirectory("graft_lsh_mp").toString
    val idx = new LshIndex(spark, base, dim = 4, numTables = 2,
      bitsPerTable = 4, seed = 7L)
    idx.build(emb, "vec_id", "embedding")
    val plain = idx.search("vec_id", "embedding", query, k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(idx.search("vec_id", "embedding", query, k = 5, probes = 1)
      .as[(Long, Double)].collect().toSeq == plain)
    // per table: exact bucket first, then probes-1 distinct flips
    val pbs = idx.queryProbeBuckets(query, probes = 3)
    assert(pbs.size == 2 && pbs.forall(_.size == 3))
    assert(pbs.zip(idx.queryProbeBuckets(query, 1)).forall {
      case (multi, exact) => multi.head == exact.head
    })
    assert(pbs.forall(b => b.distinct.size == b.size))
    // perturbation sets are bounded to <= 2 flipped bits (Lv et al.'s
    // operating regime); the FIRST flip is always the single
    // smallest-margin bit (a pair's margin sum can never beat its own
    // smaller member, and mask breaks the zero-margin tie)
    assert(pbs.forall(b => b.tail.forall(f =>
      (1 to 2).contains(java.lang.Long.bitCount(b.head ^ f)))))
    assert(pbs.forall(b =>
      java.lang.Long.bitCount(b.head ^ b.tail.head) == 1))
    // monotone: the probes=2 top-5 scores are >= plain's at each rank
    // (the candidate set only grows, and re-rank is exact)
    val mp = idx.search("vec_id", "embedding", query, k = 5, probes = 2)
      .as[(Long, Double)].collect().toSeq
    assert(mp.size >= plain.size)
    assert(mp.zip(plain).forall { case ((_, s2), (_, s1)) => s2 >= s1 })
    // scan path and index path agree probe-for-probe (same planes)
    val planes = Similarity.hyperplanes(4, 2, 4, 7L)
    assert(Similarity.lshTopK(emb, "vec_id", "embedding", query, 5,
      planes, probes = 2).as[(Long, Double)].collect().toSeq == mp)
    // past the <=2-bit reach (1 + 4 + C(4,2) = 11 here) the count is
    // refused, not capped
    assert(idx.queryProbeBuckets(query, probes = 11).forall(_.size == 11))
    intercept[IllegalArgumentException] {
      idx.queryProbeBuckets(query, probes = 12)
    }
  }

  test("build(old) + append(delta) equals build(all) — content and search") {
    val old = emb.filter($"vec_id" <= 40)
    val delta = emb.filter($"vec_id" > 40)
    val baseA = Files.createTempDirectory("graft_lsh_app").toString
    val idxA = new LshIndex(spark, baseA, dim = 4, numTables = 3,
      bitsPerTable = 2, seed = 7L)
    idxA.build(old, "vec_id", "embedding")
    idxA.append(delta, "vec_id", "embedding")
    val baseB = Files.createTempDirectory("graft_lsh_full").toString
    val idxB = new LshIndex(spark, baseB, dim = 4, numTables = 3,
      bitsPerTable = 2, seed = 7L)
    idxB.build(emb, "vec_id", "embedding")
    // identical index content: a row's buckets depend only on the row
    def content(i: LshIndex) = i.rows()
      .select($"vec_id", $"tbl".cast("int"), $"bucket".cast("long"))
      .as[(Long, Int, Long)].collect().toSet
    assert(content(idxA) == content(idxB))
    val a = idxA.search("vec_id", "embedding", query, k = 5)
      .as[(Long, Double)].collect().toSeq
    val b = idxB.search("vec_id", "embedding", query, k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("tombstone delete hides a row from every probe; purge rewrites " +
      "only hit partitions, drops emptied ones, and survives the " +
      "pre-clear kill") {
    val base = Files.createTempDirectory("graft_lsh_del").toString
    val idx = new LshIndex(spark, base, dim = 4, numTables = 3,
      bitsPerTable = 2, seed = 7L)
    idx.build(emb, "vec_id", "embedding")
    val before = idx.search("vec_id", "embedding", query, k = 5)
      .select($"vec_id").as[Long].collect().toSeq
    val victim = before.head
    assert(idx.delete(Seq(victim).toDF("vec_id"), "vec_id"))
    assert(!idx.delete(Seq(victim).toDF("vec_id"), "vec_id")) // replay
    val after = idx.search("vec_id", "embedding", query, k = 5)
      .select($"vec_id").as[Long].collect().toSeq
    assert(!after.contains(victim))
    assert(idx.rows().filter($"vec_id" === victim).count() == 0)

    // purge applies physically; pre-clear kill leaves readers correct
    graft.FailPoint.arm("lsh_purge_before_clear")
    try intercept[graft.FailPoint.Kill] {
      idx.purgeDeletes("vec_id")
    } finally graft.FailPoint.disarm()
    assert(idx.search("vec_id", "embedding", query, k = 5)
      .select($"vec_id").as[Long].collect().toSeq == after)
    idx.purgeDeletes("vec_id")
    assert(!new java.io.File(
      LshIndex.rowsPath(base, 4, 3, 2, 7L) + "_tombstones").exists)
    assert(idx.rows().filter($"vec_id" === victim).count() == 0)
    assert(idx.search("vec_id", "embedding", query, k = 5)
      .select($"vec_id").as[Long].collect().toSeq == after)
    // every copy in every table is gone from disk, not just masked
    assert(spark.read.parquet(LshIndex.rowsPath(base, 4, 3, 2, 7L))
      .filter($"vec_id" === victim).count() == 0)

    // deleting EVERY row empties the index: all partitions drop
    val all = idx.rows().select($"vec_id").distinct().as[Long].collect()
    idx.delete(all.toSeq.toDF("vec_id"), "vec_id")
    idx.purgeDeletes("vec_id")
    val rootDir = new java.io.File(LshIndex.rowsPath(base, 4, 3, 2, 7L))
    assert(!rootDir.listFiles.exists(_.getName.startsWith("tbl=")) ||
      rootDir.listFiles.filter(_.getName.startsWith("tbl="))
        .forall(d => d.listFiles.isEmpty ||
          d.listFiles.forall(_.listFiles.isEmpty)))
  }

  test("compact merges append-fragmented partitions without changing content") {
    val old = emb.filter($"vec_id" <= 40)
    val delta = emb.filter($"vec_id" > 40)
    val base = Files.createTempDirectory("graft_lsh_cpt").toString
    val idx = new LshIndex(spark, base, dim = 4, numTables = 3,
      bitsPerTable = 2, seed = 7L)
    idx.build(old, "vec_id", "embedding")
    idx.append(delta, "vec_id", "embedding")
    def content() = idx.rows()
      .select($"vec_id", $"tbl".cast("int"), $"bucket".cast("long"))
      .as[(Long, Int, Long)].collect().toSet
    def maxFilesPerPartition() = idx.rows()
      .select($"tbl", $"bucket", input_file_name().as("f"))
      .groupBy($"tbl", $"bucket").agg(countDistinct($"f").as("n"))
      .agg(max($"n")).as[Long].head()
    val before = content()
    assert(maxFilesPerPartition() > 1) // the append really fragmented
    val n = idx.compact()
    assert(n > 0)
    assert(maxFilesPerPartition() == 1) // every partition is one file
    assert(content() == before)        // rewrite lost/duplicated nothing
    // idempotent: nothing left to compact
    assert(idx.compact() == 0)
    // search still works off the compacted layout
    assert(idx.search("vec_id", "embedding", query, k = 5).count() == 5)
  }

  test("probe is partition-pruned to (tbl, bucket) and build is idempotent") {
    val base = Files.createTempDirectory("graft_lsh2").toString
    val idx = new LshIndex(spark, base, dim = 4, numTables = 2,
      bitsPerTable = 2, seed = 7L)
    idx.build(emb, "vec_id", "embedding")
    // physical layout: tbl=*/bucket=* partition dirs (parameter-keyed path)
    val tbls = new java.io.File(
        LshIndex.rowsPath(base, dim = 4, numTables = 2, bitsPerTable = 2,
          seed = 7L)).listFiles
      .filter(_.getName.startsWith("tbl=")).map(_.getName).sorted
    assert(tbls.toSeq == Seq("tbl=0", "tbl=1"))
    // the probe plan prunes partitions: the filter must actually bind
    // tbl/bucket (a bare "PartitionFilters: []" also contains the key,
    // so assert on the CONTENT)
    val probe = idx.search("vec_id", "embedding", query, k = 3)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.toString
    val filters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(filters.contains("tbl") && filters.contains("bucket"),
      s"probe not partition-pruned: [$filters]")
    // second build is a no-op (_SUCCESS short-circuit): same contents
    val before = idx.rows().count()
    idx.build(emb, "vec_id", "embedding")
    assert(idx.rows().count() == before)
    // multiprobe stays pruned: probes=2 binds tbl/bucket too — the
    // perturbed buckets widen the IN-list, not the scan
    val mp = idx.search("vec_id", "embedding", query, k = 3, probes = 2)
    mp.collect()
    val mpFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(mp.queryExecution.executedPlan.toString)
      .map(_.group(1)).getOrElse("")
    assert(mpFilters.contains("tbl") && mpFilters.contains("bucket"),
      s"multiprobe not partition-pruned: [$mpFilters]")
  }
}
