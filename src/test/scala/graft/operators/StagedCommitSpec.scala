package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The exactly-once delta-append protocol: idempotent retry, self-heal
  * of killed commits, and the recovered-equals-from-scratch law on the
  * real artifact consumers (LshIndex, refreshArtifacts). */
class StagedCommitSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Long*) = ids.toDF("id")

  test("appendOnce: second call with the same token is a no-op") {
    val dir = Files.createTempDirectory("graft_sc").toString
    df(1, 2, 3).write.mode("overwrite").parquet(dir) // base build
    val delta = df(10, 11)
    val token = StagedCommit.idToken(delta, "id")
    assert(StagedCommit.appendOnce(dir, token, Nil, delta))
    assert(!StagedCommit.appendOnce(dir, token, Nil, delta))
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 10L, 11L))
    // distinct content gets a distinct token and does append
    val delta2 = df(20)
    assert(StagedCommit.idToken(delta2, "id") != token)
    assert(StagedCommit.appendOnce(dir, StagedCommit.idToken(delta2, "id"),
      Nil, delta2))
    assert(spark.read.parquet(dir).count() == 6)
  }

  test("foldMarkers (VERDICT r17 #3): old markers fold into the token " +
      "manifest, newest K stay as files, and every committed-probe — " +
      "hasDelta, readCommitted, appendOnce's redelivery fence — " +
      "consults the union; idempotent; crash window converges") {
    val dir = Files.createTempDirectory("graft_sc_fold").toString
    df(1, 2).write.mode("overwrite").parquet(dir)
    val tokens = (1 to 8).map { i =>
      val d = df(100L + i)
      val t = StagedCommit.idToken(d, "id")
      assert(StagedCommit.appendOnce(dir, t, Nil, d))
      Thread.sleep(5L) // distinct modtimes: fold order is by age
      t
    }
    val before = StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markerFiles: Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName)
        .filter(n => n.startsWith("_delta_") && n.endsWith("_SUCCESS"))
        .toSeq
    assert(markerFiles.size == 8)
    assert(StagedCommit.foldMarkers(spark, dir, keepNewest = 3) == 5)
    assert(markerFiles.size == 3)
    // content identical; every folded token still reads committed
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == before)
    tokens.foreach(t => assert(StagedCommit.hasDelta(spark, dir, t)))
    // the redelivery fence holds for a FOLDED token: a blind re-append
    // must no-op (the old exists-probe alone would self-heal-delete
    // the committed files and re-append)
    assert(!StagedCommit.appendOnce(dir, tokens.head, Nil,
      df(101)))
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == before)
    // idempotent: nothing left above the cap
    assert(StagedCommit.foldMarkers(spark, dir, keepNewest = 3) == 0)
    // crash window: manifest updated but one marker file survives
    // (kill between rename and the deletes) — both forms say
    // committed, and the next fold converges
    val survivor = markerFiles.head
    val tok = survivor.stripPrefix("_delta_").stripSuffix("_SUCCESS")
    assert(StagedCommit.foldMarkers(spark, dir, keepNewest = 1) == 2)
    fs.create(new org.apache.hadoop.fs.Path(dir, survivor), true).close()
    assert(StagedCommit.hasDelta(spark, dir, tok))
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == before)
    // a NEW append after folding still works and re-folds later
    assert(StagedCommit.appendOnce(dir,
      StagedCommit.idToken(df(200), "id"), Nil, df(200)))
    assert(StagedCommit.readCommitted(spark, dir).count() ==
      before.size + 1)
  }

  test("kill mid-commit self-heals: stray token files swept on retry") {
    val dir = Files.createTempDirectory("graft_sc_heal").toString
    df(1, 2).write.mode("overwrite").parquet(dir)
    val delta = df(5, 6, 7)
    val token = StagedCommit.idToken(delta, "id")
    // simulate a commit killed after renaming SOME files: plant a real
    // parquet file (duplicate content) under this token's name with no
    // marker — a blind append would double rows 5..7
    val scratch = Files.createTempDirectory("graft_sc_scratch").toString
    delta.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, s"delta_${token}_99999.parquet"))
    assert(spark.read.parquet(dir).count() == 5) // partial state visible
    // retry = just run the append; it must sweep the partial first
    assert(StagedCommit.appendOnce(dir, token, Nil, delta))
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 5L, 6L, 7L))
  }

  test("readCommitted: reader overlapping a killed commit never sees " +
      "the partial delta") {
    val dir = Files.createTempDirectory("graft_sc_iso").toString
    df(1, 2).write.mode("overwrite").parquet(dir)
    val d1 = df(5, 6)
    val t1 = StagedCommit.idToken(d1, "id")
    assert(StagedCommit.appendOnce(dir, t1, Nil, d1))
    // killed mid-step-4 for a SECOND delta: one of its files renamed
    // into the live tree, no marker yet
    val d2 = df(7, 8, 9)
    val t2 = StagedCommit.idToken(d2, "id")
    val scratch = Files.createTempDirectory("graft_sc_iso_s").toString
    d2.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, s"delta_${t2}_00000.parquet"))
    // a naive read sees the torn state; the committed read does not
    assert(spark.read.parquet(dir).count() == 7)
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L, 6L))
    // retry commits d2; the committed read now sees it exactly once
    assert(StagedCommit.appendOnce(dir, t2, Nil, d2))
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L, 6L, 7L, 8L, 9L))
  }

  test("readCommitted: partitioned artifact keeps partition columns") {
    val dir = Files.createTempDirectory("graft_sc_iso_p").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val delta = Seq((3L, "a"), (4L, "c")).toDF("id", "p")
    val tok = StagedCommit.idToken(delta, "id", "p")
    assert(StagedCommit.appendOnce(dir, tok, Seq("p"), delta))
    val got = StagedCommit.readCommitted(spark, dir)
      .select("id", "p").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")))
  }

  test("LshIndex: killed append then retry equals from-scratch build") {
    val emb = (1L to 60L).map(i =>
        (i, Seq(i % 5 - 2.0, i % 7 - 3.0, i % 3 - 1.0, i % 11 - 5.0)))
      .toDF("vec_id", "embedding")
    val old = emb.filter($"vec_id" <= 40)
    val delta = emb.filter($"vec_id" > 40)
    val baseA = Files.createTempDirectory("graft_sc_lsh").toString
    val idxA = new LshIndex(spark, baseA, dim = 4, numTables = 3,
      bitsPerTable = 2, seed = 7L)
    idxA.build(old, "vec_id", "embedding")
    idxA.append(delta, "vec_id", "embedding")
    // redelivered append of the SAME delta: exactly-once, not doubled
    idxA.append(delta, "vec_id", "embedding")
    val baseB = Files.createTempDirectory("graft_sc_lshB").toString
    val idxB = new LshIndex(spark, baseB, dim = 4, numTables = 3,
      bitsPerTable = 2, seed = 7L)
    idxB.build(emb, "vec_id", "embedding")
    def content(i: LshIndex) = i.rows()
      .groupBy($"vec_id", $"tbl", $"bucket").count()
      .select($"vec_id", $"tbl".cast("int"), $"bucket".cast("long"), $"count")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(content(idxA) == content(idxB))
  }

  test("IvfIndex: killed-mid-rename partial invisible to probes; retry " +
      "converges; redelivery is a no-op") {
    val emb = (1L to 60L).map(i =>
        (i, Seq(i % 5 - 2.0, i % 7 - 3.0, i % 3 - 1.0, i % 11 - 5.0)))
      .toDF("vec_id", "embedding")
    val old = emb.filter($"vec_id" <= 40)
    val delta = emb.filter($"vec_id" > 40)
    val baseA = Files.createTempDirectory("graft_sc_ivf").toString
    val idxA = new IvfIndex(spark, baseA)
    idxA.build(old, "vec_id", "embedding", k = 4)
    // simulate an append killed mid-step-4: one of its files already
    // renamed into a live cell dir, marker never written
    val token = StagedCommit.idToken(delta, "vec_id", "embedding")
      .replaceAll("[^A-Za-z0-9_-]", "_")
    val plantDir = Files.createTempDirectory("graft_sc_ivf_plant").toString
    delta.limit(3).coalesce(1).write.mode("overwrite").parquet(plantDir)
    val planted = new java.io.File(plantDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val cellDir = new java.io.File(s"$baseA/ivf_cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head
    Files.copy(planted.toPath,
      new java.io.File(cellDir, s"delta_${token}_00000.parquet").toPath)
    // the raw dir DOES see the partial — committed probes must not
    assert(spark.read.parquet(s"$baseA/ivf_cells").count() == 43)
    assert(idxA.cells().count() == 40)
    // retry IS the recovery (sweeps the stale prefix first), and a
    // redelivered append of the same content is exactly-once
    idxA.append(delta, "vec_id", "embedding")
    idxA.append(delta, "vec_id", "embedding")
    assert(idxA.cells().count() == 60)
    // recovered state == clean build(old)+append(delta) from scratch
    val baseB = Files.createTempDirectory("graft_sc_ivfB").toString
    val idxB = new IvfIndex(spark, baseB)
    idxB.build(old, "vec_id", "embedding", k = 4)
    idxB.append(delta, "vec_id", "embedding")
    def content(i: IvfIndex) = i.cells()
      .select($"vec_id", $"cell".cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(content(idxA) == content(idxB))
  }

  test("BqIndex: killed-mid-rename partial invisible to probes; " +
      "frozen-means append converges; full rerank equals brute force") {
    val emb = (1L to 40L).map(i =>
        (i, Seq(i % 5 - 2.0, i % 7 - 3.0, i % 3 - 1.0, i % 11 - 5.0)
          .map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val old = emb.filter($"vec_id" <= 30)
    val delta = emb.filter($"vec_id" > 30)
    val base = Files.createTempDirectory("graft_sc_bq").toString
    val idx = new BqIndex(spark, base)
    idx.build(old, "vec_id", "embedding")
    // plant a partial delta under the token the retry will use
    val token = StagedCommit.idToken(delta, "vec_id", "embedding")
      .replaceAll("[^A-Za-z0-9_-]", "_")
    val plantDir = Files.createTempDirectory("graft_sc_bq_plant").toString
    // schema must match the ROWS table (vec, code) — encode the plant
    delta.limit(2).select($"vec_id", $"embedding",
        expr(Similarity.bqWordsExpr("embedding",
          idx.storedMeans())).as("_bqw"))
      .coalesce(1).write.mode("overwrite").parquet(plantDir)
    val planted = new java.io.File(plantDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(planted.toPath,
      new java.io.File(s"$base/bq_rows",
        s"delta_${token}_00000.parquet").toPath)
    assert(spark.read.parquet(s"$base/bq_rows").count() == 32)
    assert(idx.rows().count() == 30) // committed-only probe
    // retry sweeps the partial; redelivery is exactly-once
    idx.append(delta, "vec_id", "embedding")
    idx.append(delta, "vec_id", "embedding")
    assert(idx.rows().count() == 40)
    // search at full rerank = exact brute force, regardless of the
    // frozen (old-corpus) means — the exact pass re-ranks on vectors
    val q = Seq(1.0, 0.5, -0.5, 2.0)
    val got = idx.search("vec_id", "embedding", q, k = 5, rerank = 40)
      .as[(Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"$got vs $want")

    // compact folds the delta into base files, PRESERVING the delta
    // markers — the redelivered batch must keep no-opping afterwards
    // or compaction would reopen the exactly-once window
    assert(idx.compact(maxFiles = 1))
    val names = new java.io.File(s"$base/bq_rows").listFiles().map(_.getName)
    assert(!names.exists(n => n.startsWith("delta_") && n.endsWith(".parquet")))
    assert(names.exists(_.startsWith("_delta_"))) // marker retained
    assert(idx.rows().count() == 40)
    idx.append(delta, "vec_id", "embedding") // redelivery after compact
    assert(idx.rows().count() == 40)
    val got2 = idx.search("vec_id", "embedding", q, k = 5, rerank = 40)
      .as[(Long, Double)].collect().toSeq
    assert(got2 == want, s"$got2 vs $want")
    assert(!idx.compact(maxFiles = 1)) // already compact: no-op
  }

  test("BqIndex: tombstone delete hides rows from the candidate and " +
      "rerank passes; purge folds them away marker-preservingly and " +
      "survives the pre-clear kill") {
    val emb = (1L to 40L).map(i =>
        (i, Seq(i % 5 - 2.0, i % 7 - 3.0, i % 3 - 1.0, i % 11 - 5.0)
          .map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val base = Files.createTempDirectory("graft_sc_bqdel").toString
    val idx = new BqIndex(spark, base)
    idx.build(emb, "vec_id", "embedding")
    val q = Seq(1.0, 0.5, -0.5, 2.0)
    def top5 = idx.search("vec_id", "embedding", q, k = 5, rerank = 40)
      .select($"vec_id").as[Long].collect().toSeq
    val victims = top5.take(2)
    assert(idx.delete(victims.toDF("vec_id"), "vec_id"))
    assert(!idx.delete(victims.toDF("vec_id"), "vec_id")) // replay
    val after = top5
    assert(victims.forall(v => !after.contains(v)))
    // full-rerank search over the masked view equals brute force over
    // the surviving corpus
    assert(after == Similarity.bruteForceTopK(
      emb.filter(!$"vec_id".isin(victims: _*)), "vec_id", "embedding",
      q, 5).select($"vec_id").as[Long].collect().toSeq)

    graft.FailPoint.arm("bq_purge_before_clear")
    try intercept[graft.FailPoint.Kill] {
      idx.purgeDeletes()
    } finally graft.FailPoint.disarm()
    assert(top5 == after) // tombstones still mask the folded view
    assert(idx.purgeDeletes())
    assert(!new java.io.File(s"$base/bq_tombstones").exists)
    assert(idx.rows().count() == 38)
    assert(spark.read.parquet(s"$base/bq_rows")
      .filter($"vec_id".isin(victims: _*)).count() == 0) // physically gone
    assert(top5 == after)
    // markers preserved through the purge-fold: a redelivered append
    // of already-folded content must keep no-opping
    assert(!idx.purgeDeletes()) // no tombstones left: no-op
  }

  test("PqIndex: killed-mid-rename partial invisible to committed " +
      "probes; frozen-codebook append converges; full rerank equals " +
      "brute force") {
    val emb = (1L to 40L).map(i =>
        (i, Seq(i % 5 - 2.0, i % 7 - 3.0, i % 3 - 1.0, i % 11 - 5.0)
          .map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val old = emb.filter($"vec_id" <= 30)
    val delta = emb.filter($"vec_id" > 30)
    val base = Files.createTempDirectory("graft_sc_pq").toString
    val idx = new PqIndex(spark, base)
    idx.build(old, "vec_id", "embedding", m = 2, k = 8, iters = 4)
    // plant a partial delta under the very token the retry will use —
    // a commit killed after renaming one staged file but before its
    // marker (schema must match the codes table: (id, codes))
    val token = StagedCommit.safeToken(
      StagedCommit.idToken(delta, "vec_id", "embedding"))
    val plantDir = Files.createTempDirectory("graft_sc_pq_plant").toString
    Seq((31L, Seq(0.toByte, 0.toByte)), (32L, Seq(1.toByte, 0.toByte)))
      .toDF("id", "codes")
      .coalesce(1).write.mode("overwrite").parquet(plantDir)
    val planted = new java.io.File(plantDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(planted.toPath,
      new java.io.File(s"$base/pq_codes",
        s"delta_${token}_00000.parquet").toPath)
    assert(spark.read.parquet(s"$base/pq_codes").count() == 32)
    assert(idx.committedCodes().count() == 30) // committed-only probe
    // retry sweeps the partial; redelivery is exactly-once
    idx.append(delta, "vec_id", "embedding")
    idx.append(delta, "vec_id", "embedding")
    assert(idx.committedCodes().count() == 40)
    // search at full rerank = exact brute force, regardless of the
    // frozen (old-corpus) codebooks — the exact pass re-ranks vectors
    val q = Seq(1.0, 0.5, -0.5, 2.0)
    val got = idx.searchCommitted(emb, "vec_id", "embedding", q,
        k = 5, rerank = 40)
      .as[(Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"$got vs $want")
  }

  test("refreshArtifacts: kill between the two appends, retry converges") {
    val docs = (1L to 30L).map { i =>
        val base = Seq.tabulate(8)(j => s"w${(i + j) % 9}").mkString(" ")
        (i, if (i % 3 == 0) base else base + s" u$i extra$i")
      }.toDF("doc_id", "text")
    val old = docs.filter($"doc_id" % 2 === 1)
    val delta = docs.filter($"doc_id" % 2 === 0)
    val base = Files.createTempDirectory("graft_sc_refresh").toString
    val oldBanded = Dedup.bandedTable(old, "doc_id", "text", base,
      n = 3, numHashes = 32, bands = 16)
    Dedup.pairTable(old, "doc_id", "text", base, n = 3, numHashes = 32,
      bands = 16, threshold = 0.2, banded = Some(oldBanded))
    // simulate a refresh killed mid-commit of the BANDED half: plant a
    // stray file under the token the real refresh will use
    val token = StagedCommit.idToken(
      delta.select($"doc_id".as("_id")).distinct(), "_id")
    val bandedPath = s"$base/banded_n3_h32_b16"
    val scratch = Files.createTempDirectory("graft_sc_rscratch").toString
    spark.read.parquet(bandedPath).limit(3).coalesce(1)
      .write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(bandedPath, s"delta_${token}_99999.parquet"))
    // retry IS the recovery: the stray partial is swept, both halves land
    Dedup.refreshArtifacts(docs, delta.select($"doc_id"), "doc_id", "text",
      base, n = 3, numHashes = 32, bands = 16, threshold = 0.2)
    // and a SECOND full retry is a no-op (both tokens committed)
    Dedup.refreshArtifacts(docs, delta.select($"doc_id"), "doc_id", "text",
      base, n = 3, numHashes = 32, bands = 16, threshold = 0.2)
    val served = Dedup.pairTable(docs.limit(0), "doc_id", "text", base,
        n = 3, numHashes = 32, bands = 16, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    val scratchPairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 32, bands = 16, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(served == scratchPairs)
    // banded signatures: one row per (id, band), no duplicates
    val banded = spark.read.parquet(bandedPath)
    assert(banded.count() == banded.select($"id", $"band").distinct().count())
    assert(banded.select($"id").distinct().count() == 30)
  }

  test("swapBase: a kill in EITHER torn window rolls forward at the " +
      "next committed read (the old contract was 'recovery is " +
      "rebuild'); markers and the redelivery fence survive the fold; " +
      "generations never collide") {
    val dir = Files.createTempDirectory("graft_sc_swap").toString
    df(1, 2, 3).write.mode("overwrite").parquet(dir)
    val d1 = df(10, 11)
    val t1 = StagedCommit.idToken(d1, "id")
    assert(StagedCommit.appendOnce(dir, t1, Nil, d1))
    val all = Seq(1L, 2L, 3L, 10L, 11L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def names: Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).toSeq
    // window 1: kill right after the intent lands — old files still
    // present, staged files ready; the read must serve the FOLDED
    // state (roll-forward), not double rows
    graft.FailPoint.arm("swap_after_intent")
    try intercept[graft.FailPoint.Kill] {
      StagedCommit.swapBase(spark, dir,
        StagedCommit.readCommitted(spark, dir))
    } finally graft.FailPoint.disarm()
    assert(names.contains("_swap_intent")) // genuinely torn
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == all)
    assert(!names.contains("_swap_intent")) // recovery completed it
    assert(!names.contains("_stage_swap"))
    assert(names.exists(_.startsWith("compacted_0_")))
    // window 2: kill between delete-old and rename-in — THE state
    // that used to require a rebuild (zero data files on disk)
    val d2 = df(20)
    val t2 = StagedCommit.idToken(d2, "id")
    assert(StagedCommit.appendOnce(dir, t2, Nil, d2))
    graft.FailPoint.arm("swap_after_delete")
    try intercept[graft.FailPoint.Kill] {
      StagedCommit.swapBase(spark, dir,
        StagedCommit.readCommitted(spark, dir))
    } finally graft.FailPoint.disarm()
    assert(!names.exists(_.endsWith(".parquet"))) // all old files gone
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == all :+ 20L)
    // generation bumped past the deleted compacted_0_ files: recovery
    // can never rename onto a name it was also told to delete
    assert(names.exists(_.startsWith("compacted_1_")))
    assert(!names.exists(_.startsWith("compacted_0_")))
    // the redelivery fence survives both folds: markers outlive their
    // folded delta files, so redelivered tokens still no-op
    assert(!StagedCommit.appendOnce(dir, t1, Nil, d1))
    assert(!StagedCommit.appendOnce(dir, t2, Nil, d2))
    assert(StagedCommit.readCommitted(spark, dir).count() == 6)
    // an untorn swap is clean end-to-end
    StagedCommit.swapBase(spark, dir,
      StagedCommit.readCommitted(spark, dir))
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == all :+ 20L)
    assert(!names.contains("_swap_intent"))
  }

  test("swapFiles: the PARTITIONED crash-safe swap — a kill between " +
      "delete and rename rolls forward at the next committed read, " +
      "an all-folded-away partition drops its dir, markers survive, " +
      "and a snap straying outside the declared partitions refuses") {
    val dir = Files.createTempDirectory("graft_sc_swapf").toString
    val base = Seq((1L, 1), (2L, 1), (3L, 2), (4L, 2)).toDF("id", "part")
    base.write.mode("overwrite").partitionBy("part").parquet(dir)
    val d1 = Seq((10L, 1)).toDF("id", "part")
    val t1 = StagedCommit.idToken(d1, "id", "part")
    assert(StagedCommit.appendOnce(dir, t1, Seq("part"), d1))
    def served: Seq[(Long, Int)] = StagedCommit.readCommitted(spark, dir)
      .select($"id", $"part").as[(Long, Int)].collect().sorted.toSeq
    val all = Seq((1L, 1), (2L, 1), (3L, 2), (4L, 2), (10L, 1))
      .sorted
    assert(served == all)
    // fold part=1 (base + delta files → compacted), killed mid-swap in
    // the worst window: part=1 has ZERO data files on disk
    val fold1 = StagedCommit.readCommitted(spark, dir)
      .filter($"part" === 1).repartition(col("part"))
      .localCheckpoint()
    graft.FailPoint.arm("swap_after_delete")
    try intercept[graft.FailPoint.Kill] {
      StagedCommit.swapFiles(spark, dir, fold1, Seq("part"),
        Seq("part=1"))
    } finally graft.FailPoint.disarm()
    assert(served == all) // rolled forward, nothing lost
    // the fence survives the fold: the folded delta's token still no-ops
    assert(!StagedCommit.appendOnce(dir, t1, Seq("part"), d1))
    assert(served == all)
    // dead partition: folding part=2 to an EMPTY snap deletes its
    // files and drops the dir (the purge's all-tombstoned case)
    StagedCommit.swapFiles(spark, dir,
      StagedCommit.readCommitted(spark, dir)
        .filter($"part" === 2 && $"id" < 0)
        .repartition(col("part")).localCheckpoint(),
      Seq("part"), Seq("part=2"))
    assert(served == all.filter(_._2 == 1))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "part=2")))
    // discipline: staged output outside the declared set refuses
    intercept[IllegalArgumentException] {
      StagedCommit.swapFiles(spark, dir,
        StagedCommit.readCommitted(spark, dir)
          .repartition(col("part")).localCheckpoint(),
        Seq("part"), Seq("part=2"))
    }
  }

  test("maintenance lease (VERDICT r18 #2): two racing compacts — " +
      "one proceeds, one refuses loudly at entry; a crashed holder's " +
      "lease expires and the next maintainer recovers the torn swap " +
      "FIRST; an injected kill leaves the lease exactly as a process " +
      "kill would, and the same-thread retry breaks it") {
    val dir = Files.createTempDirectory("graft_sc_lease").toString
    df(1, 2, 3).write.mode("overwrite").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(dir, "_maintenance_lease")
    def plantLease(content: String): Unit = {
      val out = fs.create(lease, true)
      try out.write(content
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    // race shape 1: a FRESH lease held by another maintainer (foreign
    // jvm id, current mtime) — the second compact refuses loudly
    // before staging anything
    plantLease("99999@otherhost\t1\tforeign-token")
    val refusal = intercept[IllegalStateException] {
      StagedCommit.swapBase(spark, dir,
        spark.range(5).toDF("id"))
    }
    assert(refusal.getMessage.contains("another maintainer is active"))
    // nothing of the loser's ran: no stage dir, old files intact
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_stage_swap")))
    // race shape 2: the holder CRASHED (lease mtime stale) mid-swap,
    // leaving a terminated torn intent — the next maintainer breaks
    // the lease, rolls the torn swap forward FIRST, then runs its own
    graft.FailPoint.arm("swap_after_delete")
    fs.delete(lease, false)
    try intercept[graft.FailPoint.Kill] {
      StagedCommit.swapBase(spark, dir,
        StagedCommit.readCommitted(spark, dir))
    } finally graft.FailPoint.disarm()
    // the injected kill left the lease in place (a real process kill
    // would) and the artifact torn (zero data files, intent present)
    assert(fs.exists(lease))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_swap_intent")))
    // re-stamp it as a FOREIGN crashed holder with a stale mtime (the
    // same-JVM break path would otherwise mask the expiry path)
    plantLease("99999@otherhost\t1\tdead-token")
    fs.setTimes(lease, System.currentTimeMillis() - 3600_000L, -1)
    StagedCommit.swapBase(spark, dir,
      spark.range(7).toDF("id"))
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == (0L until 7L))
    // clean exit: lease, intent, tmp, stage all gone
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSeq
    assert(!names.contains("_maintenance_lease"))
    assert(!names.contains("_swap_intent"))
    assert(!names.contains("_swap_intent.tmp"))
    assert(!names.contains("_stage_swap"))
    // race shape 3: same-JVM dead-thread break — the kill above
    // already proved the same-THREAD break (this test retried after
    // an injected kill without touching the lease itself); assert an
    // ordinary (NonFatal) failure releases the lease immediately
    intercept[IllegalArgumentException] {
      StagedCommit.swapBase(spark, dir,
        spark.range(3).toDF("id"), outFiles = 0)
    }
    assert(!fs.exists(lease))
  }

  test("atomic intent visibility (ADVICE r18, high): a reader " +
      "overlapping the writer's tmp-write window never rolls back a " +
      "live swap — `_swap_intent.tmp` is invisible to recovery, only " +
      "a lease holder sweeps it") {
    val dir = Files.createTempDirectory("graft_sc_tmpvis").toString
    df(1, 2, 3).write.mode("overwrite").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // kill at the new pre-rename site: tmp intent on disk (complete
    // content, unpublished), stage dir full, NO visible intent
    graft.FailPoint.arm("swap_tmp_intent")
    try intercept[graft.FailPoint.Kill] {
      StagedCommit.swapBase(spark, dir,
        spark.range(9).toDF("id"))
    } finally graft.FailPoint.disarm()
    val tmp = new org.apache.hadoop.fs.Path(dir, "_swap_intent.tmp")
    assert(fs.exists(tmp))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_swap_intent")))
    // THE ADVICE SCENARIO: a committed read lands exactly here. It
    // must serve the OLD state (nothing destructive ran) and must NOT
    // delete the tmp or the stage dir — a live writer may own them
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(fs.exists(tmp))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_stage_swap")))
    // the retry (same thread → lease break) sweeps the dead tmp and
    // completes cleanly
    StagedCommit.swapBase(spark, dir,
      spark.range(9).toDF("id"))
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == (0L until 9L))
    assert(!fs.exists(tmp))
  }

  test("swapBase: an UNTERMINATED intent (writer died mid-write, " +
      "before the end-line commit point) rolls BACK at the next " +
      "committed read — nothing destructive ran, old state intact") {
    val dir = Files.createTempDirectory("graft_sc_swaptorn").toString
    df(1, 2, 3).write.mode("overwrite").parquet(dir)
    val before = StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // hand-plant the crash state: a partial intent naming a REAL data
    // file for deletion, no terminator, and an orphaned stage dir
    val victim = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).find(_.endsWith(".parquet")).get
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, "_swap_intent"), false)
    try out.write(s"del\t$victim"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "_stage_swap"))
    // rollback: the victim file survives, the intent and stage vanish
    assert(StagedCommit.readCommitted(spark, dir)
      .as[Long].collect().sorted.toSeq == before)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSeq
    assert(names.contains(victim))
    assert(!names.contains("_swap_intent"))
    assert(!names.contains("_stage_swap"))
  }

  test("lease acquire is ATOMIC on the local FS (VERDICT r19 #5): a " +
      "competitor's fresh lease refuses loudly and is NEVER " +
      "overwritten (the old create-then-read-back had a both-pass " +
      "window); a stale one breaks; the winner's content is its own") {
    val dirP = Files.createTempDirectory("graft_lease_atomic")
    val dir = new org.apache.hadoop.fs.Path(dirP.toString)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qdir = fs.makeQualified(dir)
    // simulate ANOTHER PROCESS's live lease: foreign jvm id, alive-
    // looking thread, fresh mtime — created exactly as the new atomic
    // path creates it (O_CREAT|O_EXCL single syscall, no window)
    val leaseNio = dirP.resolve("_maintenance_lease")
    java.nio.file.Files.write(leaseNio,
      "other-jvm\t1\tforeign-token".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    val ex = intercept[IllegalStateException] {
      StagedCommit.withMaintenanceLease(fs, qdir)(_ => fail("must refuse"))
    }
    assert(ex.getMessage.contains("held by"), ex.getMessage)
    // the refused acquire must not have disturbed the holder's content
    // — CREATE_NEW cannot overwrite, unlike the old non-atomic create
    assert(new String(java.nio.file.Files.readAllBytes(leaseNio),
      "UTF-8") == "other-jvm\t1\tforeign-token")
    // a STALE foreign lease breaks and the acquire proceeds; the new
    // holder's content is its own token (by construction — no
    // read-back arbitration on the atomic path)
    fs.setTimes(new org.apache.hadoop.fs.Path(qdir,
      "_maintenance_lease"), System.currentTimeMillis() - 16L * 60 * 1000,
      -1)
    StagedCommit.withMaintenanceLease(fs, qdir) { token =>
      assert(StagedCommit.leaseHeld(fs, qdir, token))
      assert(new String(java.nio.file.Files.readAllBytes(leaseNio),
        "UTF-8").endsWith("\t" + token))
    }
    assert(!java.nio.file.Files.exists(leaseNio), "released on success")
  }

  test("lease monitors are reference-counted (VERDICT r19 #7): the " +
      "interned-monitor map returns to its prior size after every " +
      "acquire/release cycle — a driver churning ephemeral table " +
      "paths no longer leaks one monitor per path forever") {
    val before = StagedCommit.leaseMonitorCount
    (1 to 20).foreach { i =>
      val dir = new org.apache.hadoop.fs.Path(
        Files.createTempDirectory(s"graft_lease_mon$i").toString)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      StagedCommit.withMaintenanceLease(fs, fs.makeQualified(dir))(_ => ())
    }
    assert(StagedCommit.leaseMonitorCount == before,
      s"20 distinct paths must not grow the map: " +
        s"$before -> ${StagedCommit.leaseMonitorCount}")
    // monitor identity under CONTENTION: two threads inside the
    // acquire for one path still serialize correctly — one wins, the
    // other refuses loudly on the fresh lease — and the entry is gone
    // once both are out
    val dir = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("graft_lease_mon_race").toString)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qdir = fs.makeQualified(dir)
    val heldLatch = new java.util.concurrent.CountDownLatch(1)
    val doneLatch = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      StagedCommit.withMaintenanceLease(fs, qdir) { _ =>
        heldLatch.countDown(); doneLatch.await()
      })
    holder.start(); heldLatch.await()
    val ex2 = intercept[IllegalStateException] {
      StagedCommit.withMaintenanceLease(fs, qdir)(_ => fail("must refuse"))
    }
    assert(ex2.getMessage.contains("held by"), ex2.getMessage)
    doneLatch.countDown(); holder.join()
    assert(StagedCommit.leaseMonitorCount == before,
      "the contended path's monitor must be reclaimed after both exit")
  }

  test("refreshLease (ADVICE r19, medium): bumps the lease mtime only " +
      "under the holder's own token — a broken-and-retaken lease is " +
      "never freshened by the old holder") {
    val dir = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("graft_lease_refresh").toString)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qdir = fs.makeQualified(dir)
    val lease = new org.apache.hadoop.fs.Path(qdir, "_maintenance_lease")
    StagedCommit.withMaintenanceLease(fs, qdir) { token =>
      val old = System.currentTimeMillis() - 10L * 60 * 1000
      fs.setTimes(lease, old, -1)
      StagedCommit.refreshLease(fs, qdir, token)
      assert(fs.getFileStatus(lease).getModificationTime > old + 60000,
        "own token must freshen the mtime")
      // a competitor's token must NOT freshen it
      fs.setTimes(lease, old, -1)
      StagedCommit.refreshLease(fs, qdir, "not-my-token")
      // tolerance for FS mtime granularity, far below the 10-min gap
      assert(fs.getFileStatus(lease).getModificationTime < old + 5000,
        "a foreign token must leave the mtime alone")
    }
  }
}
