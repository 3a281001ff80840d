package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall ladders on a CORRELATED-energy synthetic corpus (VERDICT r13
  * #6): the testdata embeddings are isotropic noise, where prefix-
  * truncation (MRL) and sign-bit codes (BQ) measure their worst case —
  * production embedding models (and anything matryoshka-trained)
  * concentrate variance in the leading dimensions, which is the shape
  * those codecs are built for. This tool generates a deterministic
  * corpus with exponentially decaying per-dimension energy plus cluster
  * structure and re-runs the mrl/bq/sq ladders, giving the OPTIMISTIC
  * counterpart to RecallCheck's pessimistic floors (both are honest:
  * real corpora sit between them).
  *
  * Corpus: `n` vectors, dim 64, assigned round-robin to `c` Gaussian
  * cluster centers; vector = (center + 0.35·noise) · energy, with
  * energy_j = exp(−λ·j). λ=0.06 puts ~50% of total variance in the
  * first 16 dims and ~80% in the first 32 — the published MRL paper's
  * shape, not a cliff. Seeded (42): every run measures the same corpus.
  *
  * Usage: `runMain graft.tools.CorrRecallCheck [k] [nQueries] [n]`.
  */
object CorrRecallCheck {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val n = args.lift(2).map(_.toInt).getOrElse(4000)
    val dim = 64
    val clusters = 64
    val lambda = 0.06
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(42)
    val energy = Array.tabulate(dim)(j => math.exp(-lambda * j))
    val varLead16 = energy.take(16).map(e => e * e).sum /
      energy.map(e => e * e).sum
    val varLead32 = energy.take(32).map(e => e * e).sum /
      energy.map(e => e * e).sum
    println(f"[corr-recall] corpus n=$n dim=$dim clusters=$clusters " +
      f"lambda=$lambda varShare(d16)=$varLead16%.3f varShare(d32)=$varLead32%.3f")
    val centers = Array.fill(clusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (1L to n.toLong).map { id =>
      val c = centers(((id - 1) % clusters).toInt)
      val v = Array.tabulate(dim)(j =>
        ((c(j) + 0.35 * rnd.nextGaussian()) * energy(j)).toFloat)
      (id, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()

    val queryIds = (1L to nQueries.toLong).toSeq
    val queryVecs: Map[Long, Seq[Double]] = queryIds.map { qid =>
      qid -> rows((qid - 1).toInt)._2.map(_.toDouble)
    }.toMap
    val exactSansSelf: Map[Long, Set[Long]] = queryIds.map { qid =>
      qid -> Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= qid),
          "vec_id", "embedding", queryVecs(qid), k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap

    def ladder(name: String, rerank: Int)(
        approxOf: (Long, Int) => Set[Long]): Unit = {
      var recallSum = 0.0
      for (qid <- queryIds)
        recallSum += (exactSansSelf(qid) & approxOf(qid, rerank))
          .size.toDouble / k
      println(f"[corr-recall] correlated $name k=$k rerank=$rerank " +
        f"queries=${queryIds.size} recall@$k=${recallSum / queryIds.size}%.4f")
    }

    val maxAbs = Similarity.sqMaxAbs(emb, "embedding")
    for (rerank <- Seq(k, 2 * k, 4 * k))
      ladder("sq8", rerank) { (qid, r) =>
        Similarity.sqTopK(emb.filter(col("vec_id") =!= qid), "vec_id",
            "embedding", queryVecs(qid), k, r, maxAbs)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }
    val bqMeans = Similarity.bqMeans(emb, "embedding")
    for (rerank <- Seq(k, 2 * k, 4 * k, 8 * k))
      ladder("bq1bit", rerank) { (qid, r) =>
        Similarity.bqTopK(emb.filter(col("vec_id") =!= qid), "vec_id",
            "embedding", queryVecs(qid), k, r, bqMeans)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }
    for (prefixDims <- Seq(16, 32); rerank <- Seq(2 * k, 4 * k))
      ladder(s"mrl$prefixDims", rerank) { (qid, r) =>
        Similarity.mrlTopK(emb.filter(col("vec_id") =!= qid), "vec_id",
            "embedding", queryVecs(qid), k, r, prefixDims)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }
    emb.unpersist()
    spark.stop()
  }
}
