package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes (dim 4 -> m=2 subspaces)
  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    (1 to 60).map { i =>
      val base = if (i <= 30) Array(10f, 0f, 0f, 0f) else Array(0f, 0f, 10f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  test("build writes m-byte codes and an m*k codebook") {
    val base = Files.createTempDirectory("graft_pq").toString
    val idx = new PqIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", m = 2, k = 4, iters = 3)
    val cb = idx.codebook().as[(Int, Int, Seq[Double])].collect()
    assert(cb.length == 8) // 2 subspaces x 4 codes
    assert(cb.forall(_._3.length == 2)) // dim/m
    val codes = idx.codes().as[(Long, Seq[Byte])].collect()
    assert(codes.length == 60 && codes.forall(_._2.length == 2))
    assert(codes.flatMap(_._2).forall(c => c >= 0 && c < 4))
  }

  test("IVFPQ: residual ADC with full rerank equals the float IVF probe") {
    val ivfBase = Files.createTempDirectory("graft_ivfpq_ivf").toString
    val ivf = new IvfIndex(spark, ivfBase)
    ivf.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    val comp = new IvfPq(spark, ivf,
      Files.createTempDirectory("graft_ivfpq").toString)
    comp.build("vec_id", "embedding", m = 2, k = 4, iters = 3)

    val query = Seq(10.0, 0.2, 0.0, 0.0)
    // rerank covers the probed cell -> residual-ADC affects only IO
    val fl = ivf.search("vec_id", "embedding", query, k = 5, nprobe = 1)
      .as[(Long, Double)].collect().toSeq
    val qz = comp.search("vec_id", "embedding", query, k = 5, rerank = 60,
        nprobe = 1)
      .as[(Long, Double)].collect().toSeq
    assert(qz == fl)
    // nprobe = all cells + full rerank -> brute force (per-cell IP
    // constants put multi-cell candidates on one scale)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect().toSeq
    val all = comp.search("vec_id", "embedding", query, k = 5, rerank = 60,
        nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(all == brute)
    // codes live in cell partitions (partition-pruned probes)
    val codeDirs = comp.codes().select("cell").distinct().count()
    assert(codeDirs == 2)
  }

  test("encode appends delta codes identical to a full re-encode (frozen codebooks)") {
    val base = Files.createTempDirectory("graft_pq_enc").toString
    val idx = new PqIndex(spark, base)
    idx.build(emb.filter($"vec_id" <= 30), "vec_id", "embedding",
      m = 2, k = 4, iters = 3)
    idx.encode(emb.filter($"vec_id" > 30), "vec_id", "embedding")
    val appended = idx.codes().as[(Long, Seq[Byte])].collect().toMap
    assert(appended.size == 60)
    // reference: re-encode the whole corpus against the SAME stored
    // codebooks — append-encoded rows must carry the identical codes
    idx.encode(emb, "vec_id", "embedding",
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    assert(idx.codes().as[(Long, Seq[Byte])].collect().toMap == appended)
  }

  test("OPQ rotation: artifact written; full-rerank search still equals brute force") {
    val base = Files.createTempDirectory("graft_pq_opq").toString
    val idx = new PqIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", m = 2, k = 4, iters = 3,
      rotate = true)
    assert(new java.io.File(s"$base/pq_rotation").exists())
    val query = Seq(10.0, 0.2, 0.0, 0.0)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect().toSeq
    // the rotation reshapes CANDIDATE space only — with rerank covering
    // the corpus the exact re-rank (original vectors) decides everything
    val full = idx.search(emb, "vec_id", "embedding", query, k = 5, rerank = 60)
      .as[(Long, Double)].collect().toSeq
    assert(full == brute)
    // deterministic across evaluations (rotation replays from artifact)
    val narrow = idx.search(emb, "vec_id", "embedding", query, k = 5, rerank = 10)
      .as[(Long, Double)].collect().toSeq
    assert(narrow == idx.search(emb, "vec_id", "embedding", query,
      k = 5, rerank = 10).as[(Long, Double)].collect().toSeq)
    // an unrotated rebuild at the same path must drop the matrix
    idx.build(emb, "vec_id", "embedding", m = 2, k = 4, iters = 3)
    assert(!new java.io.File(s"$base/pq_rotation").exists())
  }

  test("OPQ rotation improves recall on an anisotropic corpus at equal rerank") {
    // OPQ's benefit term is spectrum imbalance: here ALL the distance
    // signal lives in dims 0-3 — exactly one subspace at m=4 — so plain
    // PQ spends 3 of 4 codebooks on noise while the signal subspace gets
    // k codewords for a 4-d structure. Eigenvalue allocation spreads the
    // high-variance principal directions one per subspace. (On the
    // isotropic synthetic gate corpus the rotation is measured neutral —
    // RecallCheck/SCALE.md — because there is nothing to rebalance;
    // this corpus is the regime the rotation exists for.)
    val rnd = new scala.util.Random(11)
    val dim = 16
    val aniso = (1 to 400).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (rnd.nextFloat() - 0.5f) * (if (j < 4) 10f else 0.3f)))
    }.toDF("vec_id", "embedding")
    def recall(rotate: Boolean): Double = {
      val idx = new PqIndex(spark,
        Files.createTempDirectory("graft_pq_aniso").toString)
      idx.build(aniso, "vec_id", "embedding", m = 4, k = 8, iters = 6,
        rotate = rotate)
      val qids = 1L to 10L
      qids.map { qid =>
        val q = aniso.filter($"vec_id" === qid)
          .head().getSeq[Float](1).map(_.toDouble)
        val exact = Similarity.bruteForceTopK(aniso, "vec_id", "embedding",
            q, 10).select("vec_id").as[Long].collect().toSet
        val approx = idx.search(aniso, "vec_id", "embedding", q,
            k = 10, rerank = 40)
          .select("vec_id").as[Long].collect().toSet
        (exact & approx).size / 10.0
      }.sum / qids.size
    }
    val plain = recall(rotate = false)
    val rotated = recall(rotate = true)
    assert(rotated > plain + 0.03,
      f"rotated recall $rotated%.3f should beat plain $plain%.3f")
  }

  test("rotated IVFPQ: residual rotation preserves the full-rerank answer; append encodes rotated") {
    val ivf = new IvfIndex(spark,
      Files.createTempDirectory("graft_ivfpq_rot_ivf").toString)
    val old = emb.filter($"vec_id" % 3 =!= 0)
    val delta = emb.filter($"vec_id" % 3 === 0)
    ivf.build(old, "vec_id", "embedding", k = 2, iters = 4)
    val comp = new IvfPq(spark, ivf,
      Files.createTempDirectory("graft_ivfpq_rot").toString)
    comp.build("vec_id", "embedding", m = 2, k = 4, iters = 3,
      rotate = true)
    val query = Seq(10.0, 0.2, 0.0, 0.0)
    // orthonormal R preserves inner products: with rerank covering the
    // probed cells, the exact re-rank (ORIGINAL vectors) must equal the
    // float IVF probe exactly — the rotation may only reshape which
    // candidates ADC surfaces, and here all of them do
    val fl = ivf.search("vec_id", "embedding", query, k = 5, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(comp.search("vec_id", "embedding", query, k = 5, rerank = 60,
      nprobe = 2).as[(Long, Double)].collect().toSeq == fl)
    // append goes through the same stored rotation: healed answer equals
    // a from-scratch rotated sibling over the appended parent
    ivf.append(delta, "vec_id", "embedding")
    comp.append(delta, "vec_id", "embedding")
    val rebuilt = new IvfPq(spark, ivf,
      Files.createTempDirectory("graft_ivfpq_rot2").toString)
    rebuilt.build("vec_id", "embedding", m = 2, k = 4, iters = 3,
      rotate = true)
    assert(comp.search("vec_id", "embedding", query, k = 5, rerank = 60,
        nprobe = 2).as[(Long, Double)].collect().toSeq ==
      rebuilt.search("vec_id", "embedding", query, k = 5, rerank = 60,
        nprobe = 2).as[(Long, Double)].collect().toSeq)
  }

  test("rotSample caps the rotation's training prefix deterministically") {
    val query = Seq(10.0, 0.2, 0.0, 0.0)
    def codesWith(rotSample: Int): Map[Long, Seq[Byte]] = {
      val idx = new PqIndex(spark,
        Files.createTempDirectory("graft_pq_rcap").toString)
      idx.build(emb, "vec_id", "embedding", m = 2, k = 4, iters = 3,
        rotate = true, rotSample = rotSample)
      // a capped rotation is still orthonormal: full-rerank search must
      // stay exact regardless of the cap
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        query, 5).as[(Long, Double)].collect().toSeq
      assert(idx.search(emb, "vec_id", "embedding", query, k = 5,
        rerank = 60).as[(Long, Double)].collect().toSeq == brute)
      idx.codes().as[(Long, Seq[Byte])].collect().toMap
    }
    // cap >= sample size is the identity prefix — bit-identical artifacts
    assert(codesWith(1000) == codesWith(60))
    // a genuinely smaller prefix still yields complete, valid codes
    assert(codesWith(20).size == 60)
  }

  test("IVFPQ staleness: parent append → search refuses; IvfPq.append heals to the rebuild answer") {
    val ivf = new IvfIndex(spark,
      Files.createTempDirectory("graft_ivfpq_st_ivf").toString)
    val old = emb.filter($"vec_id" % 3 =!= 0)
    val delta = emb.filter($"vec_id" % 3 === 0)
    ivf.build(old, "vec_id", "embedding", k = 2, iters = 4)
    val pqBase = Files.createTempDirectory("graft_ivfpq_st").toString
    val comp = new IvfPq(spark, ivf, pqBase)
    comp.build("vec_id", "embedding", m = 2, k = 4, iters = 3)
    assert(comp.isFresh())
    ivf.append(delta, "vec_id", "embedding")
    // stale codes would silently drop the appended rows from candidates
    assert(!comp.isFresh())
    intercept[IllegalStateException] {
      comp.search("vec_id", "embedding", Seq(10.0, 0.2, 0.0, 0.0),
        k = 5, rerank = 60)
    }
    comp.append(delta, "vec_id", "embedding")
    assert(comp.isFresh())
    val query = Seq(10.0, 0.2, 0.0, 0.0)
    val healed = comp.search("vec_id", "embedding", query,
      k = 5, rerank = 60, nprobe = 2).as[(Long, Double)].collect().toSeq
    // reference: a from-scratch sibling over the SAME parent
    val rebuilt = new IvfPq(spark, ivf,
      Files.createTempDirectory("graft_ivfpq_st2").toString)
    rebuilt.build("vec_id", "embedding", m = 2, k = 4, iters = 3)
    val fromScratch = rebuilt.search("vec_id", "embedding", query,
      k = 5, rerank = 60, nprobe = 2).as[(Long, Double)].collect().toSeq
    assert(healed == fromScratch)
    // every delta row is encoded (reachable as a candidate) exactly once
    val codeIds = comp.codes().select("id").as[Long].collect().toSet
    assert(codeIds.size == 60)
    assert(delta.select("vec_id").as[Long].collect().toSet
      .subsetOf(codeIds))
    // append fragmented the code partitions; compact merges them
    // without touching content, search answer, or epoch freshness
    def maxFilesPerCell() = comp.codes()
      .select($"cell", input_file_name().as("f"))
      .groupBy($"cell").agg(countDistinct($"f").as("n"))
      .agg(max($"n")).as[Long].head()
    val contentBefore = comp.codes()
      .select($"id", $"codes", $"cell").collect().map(_.toString).sorted.toSeq
    assert(maxFilesPerCell() > 1)
    assert(comp.compact() > 0)
    assert(maxFilesPerCell() == 1)
    assert(comp.codes().select($"id", $"codes", $"cell")
      .collect().map(_.toString).sorted.toSeq == contentBefore)
    assert(comp.compact() == 0)
    assert(comp.isFresh())
    assert(comp.search("vec_id", "embedding", query,
      k = 5, rerank = 60, nprobe = 2).as[(Long, Double)].collect().toSeq
      == healed)
  }

  test("IVFPQ staleness: a skipped parent delta makes append refuse (mods gap)") {
    val ivf = new IvfIndex(spark,
      Files.createTempDirectory("graft_ivfpq_gap_ivf").toString)
    val d1 = emb.filter($"vec_id" % 3 === 1)
    val d2 = emb.filter($"vec_id" % 3 === 2)
    ivf.build(emb.filter($"vec_id" % 3 === 0), "vec_id", "embedding",
      k = 2, iters = 4)
    val comp = new IvfPq(spark, ivf,
      Files.createTempDirectory("graft_ivfpq_gap").toString)
    comp.build("vec_id", "embedding", m = 2, k = 4, iters = 3)
    // two parent appends, then one sibling append with only the second
    // delta: stamping the current epoch would forgive d1's rows forever
    ivf.append(d1, "vec_id", "embedding")
    ivf.append(d2, "vec_id", "embedding")
    intercept[IllegalStateException] {
      comp.append(d2, "vec_id", "embedding")
    }
    // reversed call order (sibling before parent) is a zero gap — also
    // refused, or the inevitable retry would double-encode the delta
    val comp2 = new IvfPq(spark, ivf,
      Files.createTempDirectory("graft_ivfpq_gap2").toString)
    comp2.build("vec_id", "embedding", m = 2, k = 4, iters = 3)
    intercept[IllegalStateException] {
      comp2.append(d2, "vec_id", "embedding")
    }
    // resynchronize via build
    comp.build("vec_id", "embedding", m = 2, k = 4, iters = 3)
    assert(comp.isFresh())
  }

  test("IVFPQ staleness: parent re-train → append refuses (codebooks quantize a dead distribution)") {
    val ivf = new IvfIndex(spark,
      Files.createTempDirectory("graft_ivfpq_rt_ivf").toString)
    ivf.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    val comp = new IvfPq(spark, ivf,
      Files.createTempDirectory("graft_ivfpq_rt").toString)
    comp.build("vec_id", "embedding", m = 2, k = 4, iters = 3)
    ivf.build(emb, "vec_id", "embedding", k = 2, iters = 4) // re-train
    assert(!comp.isFresh())
    intercept[IllegalStateException] {
      comp.append(emb.limit(1), "vec_id", "embedding")
    }
    intercept[IllegalStateException] {
      comp.search("vec_id", "embedding", Seq(10.0, 0.2, 0.0, 0.0),
        k = 5, rerank = 60)
    }
    comp.build("vec_id", "embedding", m = 2, k = 4, iters = 3)
    assert(comp.isFresh())
    assert(comp.search("vec_id", "embedding", Seq(10.0, 0.2, 0.0, 0.0),
      k = 5, rerank = 60).count() == 5)
  }

  test("ADC search with full rerank equals brute force; narrow rerank is deterministic") {
    val base = Files.createTempDirectory("graft_pq2").toString
    val idx = new PqIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", m = 2, k = 4, iters = 3)
    val query = Seq(10.0, 0.2, 0.0, 0.0)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect().toSeq
    // rerank covers the corpus -> the ADC stage affects only IO
    val full = idx.search(emb, "vec_id", "embedding", query, k = 5, rerank = 60)
      .as[(Long, Double)].collect().toSeq
    assert(full == brute)
    // narrow rerank: k rows, same answer every run, and candidates come
    // from the query's cluster (codewords separate the clusters)
    val narrow = idx.search(emb, "vec_id", "embedding", query, k = 5, rerank = 10)
      .as[(Long, Double)].collect().toSeq
    assert(narrow.size == 5 && narrow.forall(_._1 <= 30))
    assert(narrow == idx.search(emb, "vec_id", "embedding", query,
      k = 5, rerank = 10).as[(Long, Double)].collect().toSeq)
    intercept[IllegalArgumentException] {
      idx.search(emb, "vec_id", "embedding", query, k = 5, rerank = 3)
    }
  }
}
