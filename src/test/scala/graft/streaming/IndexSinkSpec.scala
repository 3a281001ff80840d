package graft.streaming

import graft.SparkSpec
import graft.operators.{IvfIndex, Upsert}
import org.apache.spark.sql.functions._

/** Live streaming index maintenance (VERDICT r16 #2): a real feed
  * stream drives append / in-place-update / tombstone into the IVF
  * index; the index converges to exactly the final table, replayed
  * batches skip via their markers, and a fresh checkpoint lineage over
  * a fed index refuses. */
class IndexSinkSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("pb", "vec_id")

  private def corpus = {
    val rnd = new scala.util.Random(23)
    (1 to 40).map { i =>
      val base = if (i <= 20) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, i.toLong % 4, base.map(_ + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "pb", "embedding")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select($"vec_id").as[Long].collect().toSeq

  /** Brute-force cosine top-k over a table — the oracle the index must
    * match exactly once the stream drains. */
  private def brute(tbl: org.apache.spark.sql.DataFrame, q: Seq[Double],
                    k: Int): Seq[Long] = {
    val qc = array(q.map(lit): _*)
    ids(tbl.select($"vec_id",
        graft.functions.VectorFunctions.cosineRounded(
          $"embedding".cast("array<double>"), qc).as("score"))
      .orderBy($"score".desc, $"vec_id".asc).limit(k))
  }

  test("streamed feed converges the index to the final table across " +
      "insert, in-place update, and delete waves; a replayed batch " +
      "skips; a fresh lineage refuses") {
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink")
      .toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      corpus.withColumn("ver", lit(1L)), keys, "pb", "ver", retain = 8)
    val idx = new IvfIndex(spark, s"$w/idx")
    idx.build(Upsert.readManifestedAt(spark, tbl, 0),
      "vec_id", "embedding", k = 2, iters = 4)
    // wave 1: insert two new keys near the x cluster
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((101L, 1L, Array(11f, 0f, 0f, 0f)),
          (102L, 2L, Array(12f, 0f, 0f, 0f)))
        .toDF("vec_id", "pb", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>"))
        .withColumn("ver", lit(1L)),
      keys, "pb", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    // wave 2: in-place update — key 1 jumps to the y cluster
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((1L, 1L, Array(0f, 30f, 0f, 0f)))
        .toDF("vec_id", "pb", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>"))
        .withColumn("ver", lit(2L)),
      keys, "pb", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    // wave 3: delete key 2
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((2L, 2L)).toDF("vec_id", "pb").select($"pb", $"vec_id"),
      keys, "pb", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    val q = IndexSink.startIvf(
      CdfSource.feedStream(spark, tbl, keys, feed),
      idx, "vec_id", "embedding", s"$w/ckpt")
    assert(q.awaitTermination(120000L), "index stream did not drain")
    // full-width probes == brute force over the final table, both axes
    val fin = Upsert.readManifested(spark, tbl)
    val qx = Seq(10.0, 0.2, 0.0, 0.0); val qy = Seq(0.2, 10.0, 0.0, 0.0)
    assert(ids(idx.search("vec_id", "embedding", qx, 8, 2))
      == brute(fin, qx, 8))
    assert(ids(idx.search("vec_id", "embedding", qy, 8, 2))
      == brute(fin, qy, 8))
    // the updated key serves its NEW vector: on the pure y axis its
    // (0,30,0,0) scores an exact 1.0 and the lowest-id tie-break is
    // its own; the deleted key serves nowhere; no key is duplicated
    assert(ids(idx.search("vec_id", "embedding",
      Seq(0.0, 10.0, 0.0, 0.0), 1, 2)) == Seq(1L))
    assert(idx.cells().count() == fin.count())
    // a REPLAYED batch id skips via its marker (belt on top of the
    // ops' own content tokens): state is unchanged
    val replayed = graft.operators.StagedCommit.readCommitted(spark, feed)
    val lastId = IndexSink.lastAppliedBatch(spark, idx.basePath).get
    IndexSink.applyIvfBatch(spark, replayed, lastId, idx,
      "vec_id", "embedding")
    assert(idx.cells().count() == fin.count())
    assert(ids(idx.search("vec_id", "embedding", qx, 8, 2))
      == brute(fin, qx, 8))
    // a FRESH checkpoint lineage over an index with applied batches
    // refuses loudly (the purge hazard: content tokens cannot fence a
    // full-history replay across a tombstone purge)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = IndexSink.startIvf(
        CdfSource.feedStream(spark, tbl, keys, feed),
        idx, "vec_id", "embedding", s"$w/ckpt2")
      q2.awaitTermination(120000L)
    }
    assert(ex.getMessage.contains("lineage") ||
      Option(ex.getCause).exists(_.getMessage.contains("lineage")),
      ex.getMessage)
  }

  test("an interval-coalescing batch applies in epoch order: " +
      "insert-then-delete of one key across intervals nets to absent; " +
      "delete-then-reinsert nets to present") {
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink2")
      .toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      corpus.withColumn("ver", lit(1L)), keys, "pb", "ver", retain = 8)
    val idx = new IvfIndex(spark, s"$w/idx")
    idx.build(Upsert.readManifestedAt(spark, tbl, 0),
      "vec_id", "embedding", k = 2, iters = 4)
    // interval 1: insert 201, delete 3
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((201L, 1L, Array(9f, 0f, 0f, 0f)))
        .toDF("vec_id", "pb", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>"))
        .withColumn("ver", lit(1L)),
      keys, "pb", "ver", retain = 8)
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((3L, 3L)).toDF("vec_id", "pb").select($"pb", $"vec_id"),
      keys, "pb", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    // interval 2: delete 201, re-insert 3
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((201L, 1L)).toDF("vec_id", "pb").select($"pb", $"vec_id"),
      keys, "pb", retain = 8)
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((3L, 3L, Array(0f, 0f, 5f, 0f)))
        .toDF("vec_id", "pb", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>"))
        .withColumn("ver", lit(3L)),
      keys, "pb", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    // ONE batch carries both intervals (AvailableNow over the whole
    // feed dir) — the interval walk must apply them in epoch order
    val q = IndexSink.startIvf(
      CdfSource.feedStream(spark, tbl, keys, feed),
      idx, "vec_id", "embedding", s"$w/ckpt")
    assert(q.awaitTermination(120000L), "index stream did not drain")
    val fin = Upsert.readManifested(spark, tbl)
    assert(idx.cells().count() == fin.count())
    val zTop = ids(idx.search("vec_id", "embedding",
      Seq(0.0, 0.0, 10.0, 0.0), 1, 2))
    assert(zTop == Seq(3L), s"re-inserted key must serve its new vector: $zTop")
    assert(!ids(idx.search("vec_id", "embedding",
      Seq(10.0, 0.0, 0.0, 0.0), 40, 2)).contains(201L))
  }

  test("startBm25: ranked retrieval over the live-maintained postings " +
      "== from-scratch over the final docs, across insert, in-place " +
      "text edit, and delete waves") {
    import graft.operators.TextIndex
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink4")
      .toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"; val idxBase = s"$w/idx"
    val docs = Seq(
      (1L, "spark join scan"), (2L, "join batch join"),
      (3L, "spark batch"), (4L, "spark join other"),
      (5L, "batch batch spark"), (6L, "join alone"))
      .toDF("doc_id", "text")
    def shaped(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pd", $"doc_id" % 2)
    val keys = Seq("pd", "doc_id")
    Upsert.mergeIntoManifested(spark, tbl,
      shaped(docs).withColumn("ver", lit(1L)), keys, "pd", "ver",
      retain = 8)
    TextIndex.buildScoredPostings(
      Upsert.readManifestedAt(spark, tbl, 0), "doc_id", "text", idxBase,
      buckets = 4)
    // wave 1: insert doc 7; wave 2: EDIT doc 2's text in place;
    // wave 3: delete doc 5
    Upsert.mergeIntoManifested(spark, tbl,
      shaped(Seq((7L, "join join batch")).toDF("doc_id", "text"))
        .withColumn("ver", lit(1L)), keys, "pd", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    Upsert.mergeIntoManifested(spark, tbl,
      shaped(Seq((2L, "spark other")).toDF("doc_id", "text"))
        .withColumn("ver", lit(2L)), keys, "pd", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((5L, 1L)).toDF("doc_id", "pd").select($"pd", $"doc_id"),
      keys, "pd", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    val q = IndexSink.startBm25(
      CdfSource.feedStream(spark, tbl, keys, feed),
      idxBase, "doc_id", "text", s"$w/ckpt", buckets = 4)
    assert(q.awaitTermination(120000L), "bm25 stream did not drain")
    val (p, st) = TextIndex.scoredPostingsReaders(spark, idxBase,
      buckets = 4)
    val got = TextIndex.bm25TopK(p, st, Seq("spark", "join"), k = 10,
      buckets = 4).as[(Long, Double)].collect().toSeq
    val fsBase = java.nio.file.Files
      .createTempDirectory("graft_idxsink4_fs").toString
    val fin = Upsert.readManifested(spark, tbl).select($"doc_id", $"text")
    val (fp, fs2) = TextIndex.buildScoredPostings(fin, "doc_id", "text",
      fsBase, buckets = 4)
    assert(got == TextIndex.bm25TopK(fp, fs2, Seq("spark", "join"),
      k = 10, buckets = 4).as[(Long, Double)].collect().toSeq)
    // the edited doc serves its NEW text only: no 'join' posting left
    assert(p.filter($"doc_id" === 2L && $"term" === "join").count() == 0)
  }

  test("cross-batch delete-then-reinsert with IDENTICAL content lands " +
      "(the batch-span salt: exactly-once per feed position, not per " +
      "content)") {
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink5")
      .toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      corpus.withColumn("ver", lit(1L)), keys, "pb", "ver", retain = 8)
    val idx = new IvfIndex(spark, s"$w/idx")
    idx.build(Upsert.readManifestedAt(spark, tbl, 0),
      "vec_id", "embedding", k = 2, iters = 4)
    def newRow(ver: Long) =
      Seq((301L, 1L, Array(8f, 1f, 0f, 0f)))
        .toDF("vec_id", "pb", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>"))
        .withColumn("ver", lit(ver))
    def drain(): Unit = {
      val q = IndexSink.startIvf(
        CdfSource.feedStream(spark, tbl, keys, feed),
        idx, "vec_id", "embedding", s"$w/ckpt")
      assert(q.awaitTermination(120000L))
    }
    // batch 1: insert key 301 (a real APPEND delta under its content
    // token) — drain alone
    Upsert.mergeIntoManifested(spark, tbl, newRow(1L), keys, "pb",
      "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    drain()
    assert(idx.cells().count() == 41)
    // batch 2: delete it — drain alone (tombstone pending, no purge)
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((301L, 1L)).toDF("vec_id", "pb").select($"pb", $"vec_id"),
      keys, "pb", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    drain()
    assert(idx.cells().count() == 40)
    // batch 3: re-insert the EXACT same vector. An unsalted append's
    // content token would no-op against batch 1's committed delta
    // while the purge-at-start physically removed that delta's row —
    // the key would stay lost forever. The batch-span salt makes
    // exactly-once PER FEED POSITION: the re-insert lands.
    Upsert.mergeIntoManifested(spark, tbl, newRow(2L), keys, "pb",
      "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    drain()
    assert(idx.cells().count() == 41)
    assert(idx.cells().filter($"vec_id" === 301L).count() == 1)
  }

  test("startBm25 drives delete / re-insert / delete of ONE doc id " +
      "across batches: the salted delete token subtracts stats both " +
      "times (ADVICE r17 high) and the index equals from-scratch") {
    import graft.operators.TextIndex
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink6")
      .toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"; val idxBase = s"$w/idx"
    val docs = Seq(
      (1L, "spark join scan"), (2L, "join batch join"),
      (3L, "spark batch"), (4L, "spark join other"))
      .toDF("doc_id", "text")
    def shaped(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pd", $"doc_id" % 2)
    val keys = Seq("pd", "doc_id")
    Upsert.mergeIntoManifested(spark, tbl,
      shaped(docs).withColumn("ver", lit(1L)), keys, "pd", "ver",
      retain = 8)
    TextIndex.buildScoredPostings(
      Upsert.readManifestedAt(spark, tbl, 0), "doc_id", "text", idxBase,
      buckets = 4)
    def drain(): Unit = {
      val q = IndexSink.startBm25(
        CdfSource.feedStream(spark, tbl, keys, feed),
        idxBase, "doc_id", "text", s"$w/ckpt", buckets = 4)
      assert(q.awaitTermination(120000L), "bm25 stream did not drain")
    }
    // wave A: delete doc 2 — tombstone + one stats subtraction
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((2L, 0L)).toDF("doc_id", "pd").select($"pd", $"doc_id"),
      keys, "pd", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    drain()
    // wave B: re-insert doc 2 with new text — the purge-at-start
    // clears the pending tombstone (markers included), then appends
    Upsert.mergeIntoManifested(spark, tbl,
      shaped(Seq((2L, "batch other words")).toDF("doc_id", "text"))
        .withColumn("ver", lit(2L)), keys, "pd", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    drain()
    // wave C: delete doc 2 AGAIN — under an unsalted raw-id-set token
    // this wave's stats half would no-op against wave A's still-
    // present marker in the stats dir, over-counting n_docs/total_dl
    // forever
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((2L, 0L)).toDF("doc_id", "pd").select($"pd", $"doc_id"),
      keys, "pd", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    drain()
    val (p, st) = TextIndex.scoredPostingsReaders(spark, idxBase,
      buckets = 4)
    // survivors {1,3,4} carry 3+2+3 = 8 tokens
    assert(st.agg(sum($"n_docs"), sum($"total_dl"))
      .as[(Long, Long)].head() == ((3L, 8L)))
    val fsBase = java.nio.file.Files
      .createTempDirectory("graft_idxsink6_fs").toString
    val fin = Upsert.readManifested(spark, tbl).select($"doc_id", $"text")
    val (fp, fs2) = TextIndex.buildScoredPostings(fin, "doc_id", "text",
      fsBase, buckets = 4)
    assert(TextIndex.bm25TopK(p, st, Seq("spark", "join"), k = 10,
        buckets = 4).as[(Long, Double)].collect().toSeq ==
      TextIndex.bm25TopK(fp, fs2, Seq("spark", "join"), k = 10,
        buckets = 4).as[(Long, Double)].collect().toSeq)
  }

  test("a FOREIGN in-flight crashed delete fails the batch at the " +
      "purge refusal instead of landing doomed postings (ADVICE r17 " +
      "medium); completing the delete and restarting converges") {
    import graft.operators.TextIndex
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink7")
      .toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"; val idxBase = s"$w/idx"
    val docs = Seq(
      (1L, "spark join scan"), (2L, "join batch join"),
      (3L, "spark batch")).toDF("doc_id", "text")
    def shaped(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pd", $"doc_id" % 2)
    val keys = Seq("pd", "doc_id")
    Upsert.mergeIntoManifested(spark, tbl,
      shaped(docs).withColumn("ver", lit(1L)), keys, "pd", "ver",
      retain = 8)
    TextIndex.buildScoredPostings(
      Upsert.readManifestedAt(spark, tbl, 0), "doc_id", "text", idxBase,
      buckets = 4)
    // a DIRECT (non-feed) delete of doc 3 crashes between its halves:
    // tombstone committed, stats half missing — the in-flight state
    // only its own retry can complete
    graft.FailPoint.arm("bm25_delete_after_tombstones")
    try intercept[graft.FailPoint.Kill] {
      TextIndex.deleteScoredPostings(Seq(3L).toDF("id"), "id", idxBase,
        buckets = 4)
    } finally graft.FailPoint.disarm()
    // the table deletes doc 3 then re-inserts it; the feed batch nets
    // that to... two separate polls/drains so the re-insert arrives as
    // a pure insert batch whose key the stale tombstone masks
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((3L, 1L)).toDF("doc_id", "pd").select($"pd", $"doc_id"),
      keys, "pd", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    def drain(ck: String): Unit = {
      val q = IndexSink.startBm25(
        CdfSource.feedStream(spark, tbl, keys, feed),
        idxBase, "doc_id", "text", ck, buckets = 4)
      assert(q.awaitTermination(120000L), "bm25 stream did not drain")
    }
    // the delete batch drains fine (its salted delete sees doc 3
    // already tombstoned — nothing of it lands; the foreign token's
    // dangling stats half remains)
    drain(s"$w/ckpt")
    // re-insert doc 3: the batch's purge-at-start REFUSES over the
    // foreign in-flight tombstones — the batch must FAIL (continuing
    // would land postings the next successful purge destroys)
    Upsert.mergeIntoManifested(spark, tbl,
      shaped(Seq((3L, "other words entirely")).toDF("doc_id", "text"))
        .withColumn("ver", lit(2L)), keys, "pd", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    val ex = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(s"$w/ckpt")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("purge refused")),
      messages(ex).mkString(" | "))
    // complete the foreign delete (same unsalted token -> its retry
    // finishes the stats half), restart the SAME checkpoint: the
    // replayed batch now purges cleanly and the re-insert lands
    TextIndex.deleteScoredPostings(Seq(3L).toDF("id"), "id", idxBase,
      buckets = 4)
    drain(s"$w/ckpt")
    val (p, st) = TextIndex.scoredPostingsReaders(spark, idxBase,
      buckets = 4)
    val fsBase = java.nio.file.Files
      .createTempDirectory("graft_idxsink7_fs").toString
    val fin = Upsert.readManifested(spark, tbl).select($"doc_id", $"text")
    val (fp, fs2) = TextIndex.buildScoredPostings(fin, "doc_id", "text",
      fsBase, buckets = 4)
    assert(TextIndex.bm25TopK(p, st, Seq("spark", "batch"), k = 10,
        buckets = 4).as[(Long, Double)].collect().toSeq ==
      TextIndex.bm25TopK(fp, fs2, Seq("spark", "batch"), k = 10,
        buckets = 4).as[(Long, Double)].collect().toSeq)
    assert(st.agg(sum($"n_docs")).as[Long].head() == 3L)
  }

  test("verifyCdf catches a corrupted feed (insert of a PRESENT key) " +
      "at the consumer boundary: fail throws naming the keys, " +
      "reroute converges through update") {
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink9")
      .toString
    val idx = new IvfIndex(spark, s"$w/idx")
    idx.build(corpus, "vec_id", "embedding", k = 2, iters = 4)
    // a feed batch claiming key 5 (present since the build) is an
    // INSERT — the CDF contract violation the netting would otherwise
    // trust into a duplicate row
    def badBatch = corpus.filter($"vec_id" === 5L)
      .select($"vec_id",
        transform($"embedding", x => -x).as("embedding"))
      .withColumn("_change_type", lit("insert"))
      .withColumn("_from_epoch", lit(0L))
      .withColumn("_to_epoch", lit(1L))
    val ex = intercept[IllegalStateException] {
      IndexSink.applyIvfBatch(spark, badBatch, 1L, idx,
        "vec_id", "embedding", verifyCdf = "fail")
    }
    assert(ex.getMessage.contains("already") &&
      ex.getMessage.contains("INSERT"), ex.getMessage)
    // nothing landed; the index still serves the original vector once
    assert(idx.cells().filter($"vec_id" === 5L).count() == 1)
    // reroute: the violating key goes through update — one row, the
    // NEW vector, and the batch marker lands
    IndexSink.applyIvfBatch(spark, badBatch, 1L, idx,
      "vec_id", "embedding", verifyCdf = "reroute")
    assert(idx.cells().filter($"vec_id" === 5L).count() == 1)
    val stored = idx.cells().filter($"vec_id" === 5L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]]
      .head()
    val orig = corpus.filter($"vec_id" === 5L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]]
      .head()
    assert(stored == orig.map(-_), stored.toString)
    // an untainted batch under the flag passes clean: a genuinely new
    // key appends
    val good = Seq((901L, Array(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .withColumn("_change_type", lit("insert"))
      .withColumn("_from_epoch", lit(1L))
      .withColumn("_to_epoch", lit(2L))
    IndexSink.applyIvfBatch(spark, good, 2L, idx,
      "vec_id", "embedding", verifyCdf = "fail")
    assert(idx.cells().filter($"vec_id" === 901L).count() == 1)
  }

  test("verifyCdf sample:N — sampled batches check with reroute " +
      "semantics, unsampled batches trust the feed (the documented " +
      "1/N tradeoff); unknown modes fail loudly") {
    // the mode resolver is the single routing point
    assert(IndexSink.verifyModeFor("sample:3", 0L) == "reroute")
    assert(IndexSink.verifyModeFor("sample:3", 1L) == "off")
    assert(IndexSink.verifyModeFor("sample:3", 2L) == "off")
    assert(IndexSink.verifyModeFor("sample:3", 3L) == "reroute")
    assert(IndexSink.verifyModeFor("reroute", 7L) == "reroute")
    intercept[IllegalArgumentException](
      IndexSink.verifyModeFor("sample:x", 0L))
    intercept[IllegalArgumentException](
      IndexSink.verifyModeFor("sample:0", 0L))
    intercept[IllegalArgumentException](
      IndexSink.verifyModeFor("bogus", 0L))
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink10")
      .toString
    val idx = new IvfIndex(spark, s"$w/idx")
    idx.build(corpus, "vec_id", "embedding", k = 2, iters = 4)
    def badBatch(fromE: Long) = corpus.filter($"vec_id" === 5L)
      .select($"vec_id",
        transform($"embedding", x => -x).as("embedding"))
      .withColumn("_change_type", lit("insert"))
      .withColumn("_from_epoch", lit(fromE))
      .withColumn("_to_epoch", lit(fromE + 1))
    // batchId 2 is sampled under sample:2 — the violating insert is
    // rerouted through update: still exactly one stored row
    IndexSink.applyIvfBatch(spark, badBatch(0L), 2L, idx,
      "vec_id", "embedding", verifyCdf = "sample:2")
    assert(idx.cells().filter($"vec_id" === 5L).count() == 1)
    // batchId 3 is NOT sampled — the check is skipped and the
    // duplicate lands: that is the tradeoff sample mode buys its
    // 1/N cost with (a systematic upstream bug is still caught
    // within N batches)
    IndexSink.applyIvfBatch(spark, badBatch(1L), 3L, idx,
      "vec_id", "embedding", verifyCdf = "sample:2")
    assert(idx.cells().filter($"vec_id" === 5L).count() == 2)
  }

  test("verifyCdf fail-mode crash seam closed: a retry whose own " +
      "append committed (kill between append and batch marker) " +
      "proceeds via the append-token probe instead of refusing, " +
      "while a genuine upstream violation still throws") {
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink11")
      .toString
    val idx = new IvfIndex(spark, s"$w/idx")
    idx.build(corpus, "vec_id", "embedding", k = 2, iters = 4)
    val fresh = Seq((911L, Array(1f, 2f, 3f, 4f)),
        (912L, Array(4f, 3f, 2f, 1f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .withColumn("_change_type", lit("insert"))
      .withColumn("_from_epoch", lit(3L))
      .withColumn("_to_epoch", lit(4L))
    graft.FailPoint.arm("idxsink_before_marker")
    try intercept[graft.FailPoint.Kill] {
      IndexSink.applyIvfBatch(spark, fresh, 4L, idx,
        "vec_id", "embedding", verifyCdf = "fail")
    } finally graft.FailPoint.disarm()
    // the crash state: rows appended, batch marker missing — the
    // retry's verify sees its own keys "present"
    assert(idx.cells().filter($"vec_id".isin(911L, 912L)).count() == 2)
    // this retry used to throw (the documented KNOWN SEAM requiring a
    // manual reroute run); the committed append token now identifies
    // it as self-caused and the batch completes without duplicates
    IndexSink.applyIvfBatch(spark, fresh, 4L, idx,
      "vec_id", "embedding", verifyCdf = "fail")
    assert(idx.cells().filter($"vec_id".isin(911L, 912L)).count() == 2)
    // the marker landed: a full replay now skips before any netting
    IndexSink.applyIvfBatch(spark, fresh, 4L, idx,
      "vec_id", "embedding", verifyCdf = "fail")
    assert(idx.cells().filter($"vec_id".isin(911L, 912L)).count() == 2)
    // and a GENUINE violation (same keys re-marked insert at a NEW
    // feed position — its token never committed) still throws
    val bogus = fresh
      .withColumn("_from_epoch", lit(5L))
      .withColumn("_to_epoch", lit(6L))
    val ex = intercept[IllegalStateException] {
      IndexSink.applyIvfBatch(spark, bogus, 6L, idx,
        "vec_id", "embedding", verifyCdf = "fail")
    }
    assert(ex.getMessage.contains("NOT committed"), ex.getMessage)
  }

  test("compactEvery bounds delta-file growth on a long tail " +
      "(VERDICT r17 #2): the folded index serves the same results, " +
      "and a replayed batch still no-ops post-compaction") {
    import graft.operators.TextIndex
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink8")
      .toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"; val idxBase = s"$w/idx"
    def shaped(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pd", $"doc_id" % 2)
    val keys = Seq("pd", "doc_id")
    Upsert.mergeIntoManifested(spark, tbl,
      shaped(Seq((1L, "spark join scan"), (2L, "join batch join"))
        .toDF("doc_id", "text")).withColumn("ver", lit(1L)),
      keys, "pd", "ver", retain = 16)
    TextIndex.buildScoredPostings(
      Upsert.readManifestedAt(spark, tbl, 0), "doc_id", "text", idxBase,
      buckets = 2)
    val root = s"$idxBase/scored_postings_b2"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def statFiles: Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/stats"))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    def drain(): Unit = {
      val q = IndexSink.startBm25(
        CdfSource.feedStream(spark, tbl, keys, feed),
        idxBase, "doc_id", "text", s"$w/ckpt", buckets = 2,
        compactEvery = 1)
      assert(q.awaitTermination(120000L), "bm25 stream did not drain")
    }
    // 6 insert waves, drained one batch at a time with compactEvery=1:
    // stats would otherwise accumulate one file per batch
    (10L to 15L).foreach { i =>
      Upsert.mergeIntoManifested(spark, tbl,
        shaped(Seq((i, s"doc number $i spark")).toDF("doc_id", "text"))
          .withColumn("ver", lit(1L)), keys, "pd", "ver", retain = 16)
      CdfSource.pollOnce(spark, tbl, keys, feed)
      drain()
    }
    assert(statFiles == 1, s"stats files not folded: $statFiles")
    val (p, st) = TextIndex.scoredPostingsReaders(spark, idxBase,
      buckets = 2)
    val fsBase = java.nio.file.Files
      .createTempDirectory("graft_idxsink8_fs").toString
    val fin = Upsert.readManifested(spark, tbl).select($"doc_id", $"text")
    val (fp, fs2) = TextIndex.buildScoredPostings(fin, "doc_id", "text",
      fsBase, buckets = 2)
    def topk(pp: org.apache.spark.sql.DataFrame,
             ss: org.apache.spark.sql.DataFrame) =
      TextIndex.bm25TopK(pp, ss, Seq("spark", "join"), k = 10,
        buckets = 2).as[(Long, Double)].collect().toSeq
    assert(topk(p, st) == topk(fp, fs2))
    assert(st.agg(sum($"n_docs")).as[Long].head() == 8L)
    // a REPLAYED batch (marker-gated) still no-ops post-compaction,
    // and so do the ops' own content tokens if driven directly
    val replayed = graft.operators.StagedCommit.readCommitted(spark, feed)
    drain() // same checkpoint: nothing new -> every batch skips
    assert(statFiles == 1 && replayed.count() > 0)
    assert(topk(TextIndex.scoredPostingsReaders(spark, idxBase,
      buckets = 2)._1, st) == topk(fp, fs2))
  }

  test("startLsh: the forest converges across insert, in-place update, " +
      "and delete waves — every table copy replaced or retired") {
    val w = java.nio.file.Files.createTempDirectory("graft_idxsink3")
      .toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      corpus.withColumn("ver", lit(1L)), keys, "pb", "ver", retain = 8)
    val idx = new graft.operators.LshIndex(spark, s"$w/idx", dim = 4,
      numTables = 3, bitsPerTable = 4)
    idx.build(Upsert.readManifestedAt(spark, tbl, 0),
      "vec_id", "embedding")
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((101L, 1L, Array(11f, 0f, 0f, 0f)))
        .toDF("vec_id", "pb", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>"))
        .withColumn("ver", lit(1L)),
      keys, "pb", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((1L, 1L, Array(0f, 30f, 0f, 0f)))
        .toDF("vec_id", "pb", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>"))
        .withColumn("ver", lit(2L)),
      keys, "pb", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq((2L, 2L)).toDF("vec_id", "pb").select($"pb", $"vec_id"),
      keys, "pb", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    val q = IndexSink.startLsh(
      CdfSource.feedStream(spark, tbl, keys, feed),
      idx, "vec_id", "embedding", s"$w/ckpt")
    assert(q.awaitTermination(120000L), "lsh stream did not drain")
    val fin = Upsert.readManifested(spark, tbl)
    // every surviving key serves exactly numTables copies; the deleted
    // key serves none; the updated key's stored vector is the NEW one
    // in every copy
    assert(idx.rows().count() == fin.count() * 3)
    assert(idx.rows().select($"vec_id").distinct().as[Long].collect()
      .toSet == fin.select($"vec_id").as[Long].collect().toSet)
    val stored = idx.rows().filter($"vec_id" === 1L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]]
      .collect()
    assert(stored.length == 3 &&
      stored.forall(_ == Seq(0.0, 30.0, 0.0, 0.0)), stored.toString)
  }
}
