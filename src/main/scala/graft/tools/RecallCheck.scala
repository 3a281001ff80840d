package graft.tools

import graft.Tables
import graft.operators.{IvfIndex, IvfPq, LshIndex, PqIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure recall@k of the approximate ANN paths against the
  * exact brute-force ranking on the actual corpus — int8 scalar
  * quantization (`sqTopK`) across a sweep of rerank depths. Quantifies
  * the candidate-depth/recall trade before anyone trusts the 4×-IO
  * claim at a given rerank setting (the gate's hash-match proves
  * pipeline fidelity, not retrieval quality — this measures quality). */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.load(spark, dir, "embeddings")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val maxAbs = Similarity.sqMaxAbs(emb, "embedding")
      val queryIds = emb.select("vec_id").orderBy("vec_id")
        .limit(nQueries).collect().map(_.getLong(0)).toSeq
      // query vectors and exact top-k sets do not depend on the rerank
      // sweep — compute each once per query, not once per (query, rerank)
      val queryVecs: Map[Long, Seq[Double]] = queryIds.map { qid =>
        qid -> emb.filter(col("vec_id") === qid)
          .head().getSeq[Float](1).map(_.toDouble).toSeq
      }.toMap
      // sq excludes the query row from its corpus; the index paths keep it
      val exactSansSelf: Map[Long, Set[Long]] = queryIds.map { qid =>
        qid -> Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= qid),
            "vec_id", "embedding", queryVecs(qid), k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }.toMap
      val exactFull: Map[Long, Set[Long]] = queryIds.map { qid =>
        qid -> Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            queryVecs(qid), k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }.toMap
      for (rerank <- Seq(k, 2 * k, 4 * k)) {
        var recallSum = 0.0
        for (qid <- queryIds) {
          val corpus = emb.filter(col("vec_id") =!= qid)
          val approx = Similarity.sqTopK(corpus, "vec_id", "embedding",
              queryVecs(qid), k, rerank, maxAbs)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          recallSum += (exactSansSelf(qid) & approx).size.toDouble / k
        }
        println(f"[recallcheck] $sf sq8 k=$k rerank=$rerank " +
          f"queries=${queryIds.size} recall@$k=${recallSum / queryIds.size}%.4f")
      }
      // BQ: 1 bit/dim (32x compression) — recall measures how much
      // ranking signal the sign bits keep at each rerank depth; the
      // corpus/query handling mirrors sq (query row excluded)
      val bqMeans = Similarity.bqMeans(emb, "embedding")
      for (rerank <- Seq(k, 2 * k, 4 * k, 8 * k)) {
        var recallSum = 0.0
        for (qid <- queryIds) {
          val corpus = emb.filter(col("vec_id") =!= qid)
          val approx = Similarity.bqTopK(corpus, "vec_id", "embedding",
              queryVecs(qid), k, rerank, bqMeans)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          recallSum += (exactSansSelf(qid) & approx).size.toDouble / k
        }
        println(f"[recallcheck] $sf bq1bit k=$k rerank=$rerank " +
          f"queries=${queryIds.size} recall@$k=${recallSum / queryIds.size}%.4f")
      }
      // MRL truncated-prefix: recall vs prefix width at fixed rerank —
      // how much of the ranking the first d/4 and d/2 dims carry on
      // THIS corpus (synthetic embeddings are not matryoshka-trained,
      // so this is the pessimistic floor)
      for (prefixDims <- Seq(16, 32); rerank <- Seq(2 * k, 4 * k)) {
        var recallSum = 0.0
        for (qid <- queryIds) {
          val corpus = emb.filter(col("vec_id") =!= qid)
          val approx = Similarity.mrlTopK(corpus, "vec_id", "embedding",
              queryVecs(qid), k, rerank, prefixDims)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          recallSum += (exactSansSelf(qid) & approx).size.toDouble / k
        }
        println(f"[recallcheck] $sf mrl$prefixDims%d k=$k rerank=$rerank " +
          f"queries=${queryIds.size} recall@$k=${recallSum / queryIds.size}%.4f")
      }
      // PQ-ADC: 8-byte codes (32x compression), so recall measures how
      // much ranking signal survives the quantization. The query row
      // stays in the corpus on BOTH sides (it holds one of the k slots
      // identically), so recall compares like with like.
      for (codewords <- args.lift(2).map(s => Seq(s.toInt)).getOrElse(Seq(16, 64));
           rotate <- Seq(false, true)) {
        // rotate=true: OPQ-lite (PCA + balanced eigenvalue allocation)
        // before the subspace split — the measured answer to "does the
        // rotation buy recall on THIS corpus at equal rerank"
        val pq = new PqIndex(spark,
          java.nio.file.Files.createTempDirectory(s"recall_pq").toString)
        pq.build(emb, "vec_id", "embedding", m = 8, k = codewords, iters = 3,
          rotate = rotate)
        val tag = if (rotate) "opq" else ""
        for (rerank <- Seq(2 * k, 4 * k, 8 * k)) {
          var recallSum = 0.0
          for (qid <- queryIds) {
            val approx = pq.search(emb, "vec_id", "embedding",
                queryVecs(qid), k, rerank)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            recallSum += (exactFull(qid) & approx).size.toDouble / k
          }
          println(f"[recallcheck] $sf pq8x$codewords%d$tag k=$k rerank=$rerank " +
            f"queries=${queryIds.size} recall@$k=${recallSum / queryIds.size}%.4f")
        }
      }
      // IVFPQ end-to-end (coarse-quantizer miss + residual-PQ loss
      // together — the number a user of the composed index actually
      // gets). Residual encoding should beat flat PQ at equal code
      // size; measured rotated and not, since the gate composition now
      // OPQ-rotates residuals before the subspace split.
      val ivf = new IvfIndex(spark,
        java.nio.file.Files.createTempDirectory("recall_ivf").toString)
      ivf.build(emb, "vec_id", "embedding", k = 8, iters = 3)
      for (rotate <- Seq(false, true)) {
        val comp = new IvfPq(spark, ivf,
          java.nio.file.Files.createTempDirectory("recall_ivfpq").toString)
        comp.build("vec_id", "embedding", m = 8, k = 64, iters = 3,
          rotate = rotate)
        val tag = if (rotate) "opq" else ""
        for ((nprobe, rerank) <- Seq((1, 4 * k), (2, 4 * k), (2, 8 * k))) {
          var recallSum = 0.0
          var ceilSum = 0.0
          for (qid <- queryIds) {
            val approx = comp.search("vec_id", "embedding", queryVecs(qid),
                k, rerank, nprobe)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            recallSum += (exactFull(qid) & approx).size.toDouble / k
            // float probe at the same nprobe = the coarse-quantizer
            // ceiling; composite recall below it is the PQ loss
            val ceil = ivf.search("vec_id", "embedding", queryVecs(qid),
                k, nprobe)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            ceilSum += (exactFull(qid) & ceil).size.toDouble / k
          }
          println(f"[recallcheck] $sf ivfpq8x64$tag k=$k nprobe=$nprobe " +
            f"rerank=$rerank queries=${queryIds.size} " +
            f"recall@$k=${recallSum / queryIds.size}%.4f " +
            f"(float-probe ceiling ${ceilSum / queryIds.size}%.4f)")
        }
      }
      // sign-LSH forest: the recall/IO knob under test is multiprobe —
      // each extra probe reads one more pruned partition per table
      val lsh = new LshIndex(spark,
        java.nio.file.Files.createTempDirectory("recall_lsh").toString,
        dim = 64, numTables = 4, bitsPerTable = 8, seed = 42L)
      lsh.build(emb, "vec_id", "embedding")
      for (probes <- Seq(1, 2, 4)) {
        var recallSum = 0.0
        for (qid <- queryIds) {
          val approx = lsh.search("vec_id", "embedding", queryVecs(qid),
              k, probes)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          recallSum += (exactFull(qid) & approx).size.toDouble / k
        }
        println(f"[recallcheck] $sf lsh4x8 k=$k probes=$probes " +
          f"queries=${queryIds.size} recall@$k=${recallSum / queryIds.size}%.4f")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
