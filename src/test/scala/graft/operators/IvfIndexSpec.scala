package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes + noise dims
  private lazy val emb = {
    val rnd = new scala.util.Random(3)
    (1 to 60).map { i =>
      val base = if (i <= 30) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  test("build partitions corpus into cells; k-means separates clusters") {
    val base = Files.createTempDirectory("graft_ivf").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)

    val cells = idx.cells().select("vec_id", "cell").as[(Long, Int)].collect()
    val byCluster = cells.groupBy(_._1 <= 30).view.mapValues(_.map(_._2).distinct).toMap
    // each true cluster maps to exactly one cell, and they differ
    assert(byCluster(true).length == 1 && byCluster(false).length == 1)
    assert(byCluster(true).head != byCluster(false).head)
    // physical layout: one dir per cell
    assert(new java.io.File(s"$base/ivf_cells").listFiles
      .count(_.getName.startsWith("cell=")) == 2)
  }

  test("search with nprobe=1 scans only the query's cluster; nprobe=k matches brute force") {
    val base = Files.createTempDirectory("graft_ivf2").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)

    val query = Seq(10.0, 0.2, 0.0, 0.0) // near cluster 1
    val probe1 = idx.search("vec_id", "embedding", query, k = 5, nprobe = 1)
      .as[(Long, Double)].collect()
    assert(probe1.length == 5)
    assert(probe1.forall(_._1 <= 30))

    val probeAll = idx.search("vec_id", "embedding", query, k = 5, nprobe = 2)
      .as[(Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect()
    assert(probeAll.toSeq == brute.toSeq)
  }

  test("quantized probe with full rerank equals the float probe; sq sibling is cell-partitioned") {
    val base = Files.createTempDirectory("graft_ivf_sq").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    idx.ensureSq("vec_id", "embedding")

    val query = Seq(10.0, 0.2, 0.0, 0.0)
    val fl = idx.search("vec_id", "embedding", query, k = 5, nprobe = 1)
      .as[(Long, Double)].collect().toSeq
    // rerank covers the probed cell -> the int8 candidate stage cannot
    // change the result, only its IO
    val qz = idx.searchQuantized("vec_id", "embedding", query,
        k = 5, rerank = 60, nprobe = 1)
      .as[(Long, Double)].collect().toSeq
    assert(qz == fl)
    // narrow rerank still returns k, deterministically
    val narrow = idx.searchQuantized("vec_id", "embedding", query,
        k = 3, rerank = 5, nprobe = 1)
      .as[(Long, Double)].collect().toSeq
    assert(narrow.size == 3)
    assert(narrow == idx.searchQuantized("vec_id", "embedding", query,
      k = 3, rerank = 5, nprobe = 1).as[(Long, Double)].collect().toSeq)
    // the sibling mirrors the cell layout (partition pruning works) and
    // stores tinyint components
    assert(new java.io.File(s"$base/ivf_cells_sq").listFiles
      .count(_.getName.startsWith("cell=")) == 2)
    val qtype = spark.read.parquet(s"$base/ivf_cells_sq").schema("q").dataType
    assert(qtype == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, true) ||
      qtype == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, false), qtype.toString)
    // ensureSq is a build-once no-op on the second call
    idx.ensureSq("vec_id", "embedding")
    assert(idx.searchQuantized("vec_id", "embedding", query,
      k = 5, rerank = 60, nprobe = 1).as[(Long, Double)].collect().toSeq == fl)
  }

  test("append invalidates the quantized sibling; re-ensure sees appended rows") {
    val base = Files.createTempDirectory("graft_ivf_sq_inv").toString
    val idx = new IvfIndex(spark, base)
    val old = emb.filter($"vec_id" =!= 1L)
    idx.build(old, "vec_id", "embedding", k = 2, iters = 4)
    idx.ensureSq("vec_id", "embedding")
    // row 1 (deep in cluster 0) arrives after the sibling was built
    idx.append(emb.filter($"vec_id" === 1L), "vec_id", "embedding")
    // stale sibling would silently never surface row 1 as a candidate;
    // append must have dropped it so ensureSq rebuilds over ALL rows
    idx.ensureSq("vec_id", "embedding")
    val query = Seq(10.0, 0.2, 0.0, 0.0)
    val ids = idx.searchQuantized("vec_id", "embedding", query,
        k = 30, rerank = 60, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(ids.contains(1L), s"appended row missing from quantized probe: $ids")
  }

  test("drift flags cells whose current mean moved off the stored centroid") {
    val base = Files.createTempDirectory("graft_ivf_drift").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    // freshly built: the stored centroid is one Lloyd step behind the
    // final assignment's mean — near-1 cosine, nothing to retrain
    val before = idx.drift("embedding", minCosine = 0.9)
      .as[(Int, Double, Boolean)].collect()
    assert(before.length == 2 && before.forall(!_._3), before.toSeq)
    // a skewed append (frozen quantizer) drags its cell's mean away
    val delta = (100 to 130)
      .map(i => (i.toLong, Array(10f, 6f, 0f, 0f))).toDF("vec_id", "embedding")
    idx.append(delta, "vec_id", "embedding")
    val after = idx.drift("embedding", minCosine = 0.999)
      .as[(Int, Double, Boolean)].collect()
    assert(after.exists(_._3), after.toSeq) // the polluted cell flags
  }

  test("append assigns delta rows to existing centroids without re-training") {
    val base = Files.createTempDirectory("graft_ivf_app").toString
    val idx = new IvfIndex(spark, base)
    // train on a subset, then ingest the rest (FAISS add-after-train)
    val old = emb.filter($"vec_id" % 3 =!= 0)
    val delta = emb.filter($"vec_id" % 3 === 0)
    idx.build(old, "vec_id", "embedding", k = 2, iters = 4)
    val centroidsBefore = idx.centroids().collect().map(_.toString).sorted.toSeq
    idx.append(delta, "vec_id", "embedding")
    // quantizer frozen, all rows present
    assert(idx.centroids().collect().map(_.toString).sorted.toSeq == centroidsBefore)
    assert(idx.cells().count() == 60)
    // appended rows landed in their true cluster's cell: each cluster
    // maps to exactly one cell even after the append
    val cells = idx.cells().select("vec_id", "cell").as[(Long, Int)].collect()
    val byCluster = cells.groupBy(_._1 <= 30).view.mapValues(_.map(_._2).distinct).toMap
    assert(byCluster(true).length == 1 && byCluster(false).length == 1)
    assert(byCluster(true).head != byCluster(false).head)
  }

  test("compact merges append-fragmented cells; content and probe unchanged") {
    val base = Files.createTempDirectory("graft_ivf_cpt").toString
    val idx = new IvfIndex(spark, base)
    val old = emb.filter($"vec_id" % 3 =!= 0)
    val delta = emb.filter($"vec_id" % 3 === 0)
    idx.build(old, "vec_id", "embedding", k = 2, iters = 4)
    idx.append(delta, "vec_id", "embedding")
    def content() = idx.cells().select("vec_id", "cell")
      .as[(Long, Int)].collect().toSet
    def maxFilesPerCell() = idx.cells()
      .select($"cell", input_file_name().as("f"))
      .groupBy($"cell").agg(countDistinct($"f").as("n"))
      .agg(max($"n")).as[Long].head()
    val before = content()
    assert(maxFilesPerCell() > 1)
    assert(idx.compact() > 0)
    assert(maxFilesPerCell() == 1)
    assert(content() == before)
    assert(idx.compact() == 0)
    val q = Seq(10.0, 0.3, 0.0, 0.0)
    val probe = idx.search("vec_id", "embedding", q, k = 5, nprobe = 2)
      .as[(Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect()
    assert(probe.toSeq == brute.toSeq)
  }

  test("build at realistic k (64 cells, sf0.1 corpus) — no plan blow-up") {
    // the broadcast-table + argmin-aggregate assignment keeps the plan
    // O(1) in k; the previous k×dim literal expression tree made large-k
    // builds a driver-side planning bomb re-paid every Lloyd round
    val corpus = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val base = Files.createTempDirectory("graft_ivf64").toString
    val idx = new IvfIndex(spark, base)
    idx.build(corpus, "vec_id", "embedding", k = 64, iters = 2)
    val nCells = idx.cells().select("cell").distinct().count()
    assert(nCells > 32 && nCells <= 64) // real spread, not one hot cell
    val q = corpus.filter($"vec_id" === 0).select("embedding")
      .as[Seq[Float]].head().map(_.toDouble)
    val top = idx.search("vec_id", "embedding", q, k = 5, nprobe = 8).collect()
    assert(top.length == 5)
    assert(top.head.getLong(0) == 0L) // the query vector itself wins
  }

  test("SemDeDup composition: learned-cell blocking + components keep " +
      "exactly one representative per semantic-duplicate group") {
    val base = Files.createTempDirectory("graft_semdedup").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    val cells = idx.cells().select($"vec_id", $"embedding", $"cell")
    // within a tight cluster every pair is near-cosine-1; across the
    // orthogonal clusters cosine ≈ 0 — and those pairs are never even
    // GENERATED (different cells)
    val pairs = Dedup.embeddingNearDupPairs(cells, "vec_id", "embedding",
      "cell", threshold = 0.9)
    val labeled = Dedup.connectedComponents(
        cells.select($"vec_id".as("id")),
        pairs.select($"id_a", $"id_b"))
      .withColumn("keep", ($"id" === $"comp").cast("int"))
      .as[(Long, Long, Int)].collect()
    assert(labeled.length == 60)
    // both axis clusters collapse: one keeper each, min id representative
    val byComp = labeled.groupBy(_._2)
    assert(byComp.keySet == Set(1L, 31L))
    byComp.foreach { case (comp, members) =>
      assert(members.count(_._3 == 1) == 1)
      assert(members.find(_._3 == 1).get._1 == comp)
      assert(members.map(_._1).min == comp)
    }
  }
}
