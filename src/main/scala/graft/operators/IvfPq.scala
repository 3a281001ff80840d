package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF × PQ with residual encoding — the FAISS IVFPQ composition.
  *
  * Build: every stored row's RESIDUAL (vector − its cell's centroid) is
  * product-quantized; codes are written partitioned by the same cell
  * ids as the parent [[IvfIndex]]. Residuals are much smaller than raw
  * vectors once the coarse quantizer has absorbed the cluster structure,
  * so the same codebook budget buys more precision — the reason FAISS
  * encodes residuals rather than vectors.
  *
  * STALENESS CONTRACT: the codes are tied to the parent index's cell
  * assignments at build time. After `ivf.build()` or `ivf.append()`,
  * call [[build]] again — the parent cannot invalidate this sibling
  * (it does not know about it), and probing fresh cells with stale
  * codes silently drops the changed rows from the candidate set. The
  * gate path is parameter-keyed and Bench wipes artifacts, so the
  * driver flow rebuilds naturally; long-lived callers own the rebuild.
  *
  * Search (inner-product form): IP(q, y) = IP(q, c_cell) + IP(q, r), so
  * within a probed cell the per-cell term is constant and candidates
  * rank by the ADC estimate of IP(q, r̂) alone; across cells the
  * constant is added back per cell. The candidate pass reads ONLY the
  * probed cells' m-byte codes (partition-pruned, 32× fewer bytes);
  * exact cosine re-ranks the `rerank` survivors from the float cells. */
final class IvfPq(spark: SparkSession, ivf: IvfIndex, pqBase: String) {

  private val pq = new PqIndex(spark, pqBase)

  def codes(): DataFrame = pq.codes()
  def codebook(): DataFrame = pq.codebook()

  /** Train the residual codebooks and encode the indexed corpus. */
  def build(idCol: String, vecCol: String,
            m: Int = 8, k: Int = 64, iters: Int = 3): Unit = {
    val cents = ivf.centroids().withColumnRenamed("centroid", "_cent")
    val resid = ivf.cells().join(broadcast(cents), "cell")
      .select(col(idCol), col("cell"),
        zip_with(col(vecCol).cast("array<double>"), col("_cent"),
          (a, b) => a - b).as("residual"))
    pq.build(resid, idCol, "residual", m, k, iters,
      partitionBy = Some("cell"))
  }

  /** Probe: coarse cell choice as in [[IvfIndex.search]]; ADC over the
    * probed cells' codes (LUT from the ORIGINAL query against the
    * residual codebooks, plus the per-cell IP(q, centroid) constant so
    * multi-cell probes rank on one scale); exact re-rank of the top
    * `rerank` rows. */
  def search(idCol: String, vecCol: String, query: Seq[Double],
             k: Int, rerank: Int, nprobe: Int = 1): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val q = array(query.map(lit): _*)
    val best = ivf.probeCells(q, nprobe)
    // per-cell constant IP(q, centroid), 6-dp like every ADC term
    val cents = ivf.centroids().collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    val cellConst = best.map { c =>
      c -> BigDecimal(query.zip(cents(c)).map { case (a, b) => a * b }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val constCol = best.tail.foldLeft(
      lit(cellConst(best.head))) { (acc, c) =>
      when(col("cell") === c, lit(cellConst(c))).otherwise(acc)
    }
    val cand = pq.codes().filter(col("cell").isin(best: _*))
      .select(col("id").as(idCol),
        round(pq.adcScore(query) + constCol, 6).as("_adc"))
      .orderBy(col("_adc").desc, col(idCol).asc)
      .limit(rerank)
      .select(col(idCol))
    ivf.cells().filter(col("cell").isin(best: _*))
      .join(broadcast(cand), idCol)
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q)
          .as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
