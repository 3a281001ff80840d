package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * STALENESS is checked, not documented away: [[build]] and [[append]]
  * record the parent's [[IndexEpoch]] next to the codes, and [[search]]
  * refuses to run when the parent's current epoch differs — probing
  * fresh cells with stale codes would silently drop the changed rows
  * from the candidate set (the same hazard class the parent's SQ
  * sibling closes with auto-invalidation; the parent cannot delete this
  * sibling because it does not know about it, so the sibling carries
  * the check). After `ivf.append(delta)`, call [[append]] with the same
  * delta (frozen codebooks — the FAISS `add` analog); after
  * `ivf.build()`, only a full [[build]] is valid (new quantizer ⟹ new
  * residual distribution).
  *
  * Search (inner-product form): IP(q, y) = IP(q, c_cell) + IP(q, r), so
  * within a probed cell the per-cell term is constant and candidates
  * rank by the ADC estimate of IP(q, r̂) alone; across cells the
  * constant is added back per cell. The candidate pass reads ONLY the
  * probed cells' m-byte codes (partition-pruned, 32× fewer bytes);
  * exact cosine re-ranks the `rerank` survivors from the float cells. */
final class IvfPq(spark: SparkSession, ivf: IvfIndex, pqBase: String) {

  private val pq = new PqIndex(spark, pqBase)
  private def epochRecordPath = s"$pqBase/ivfpq_parent_epoch"

  def codes(): DataFrame = pq.codes()
  def codebook(): DataFrame = pq.codebook()

  /** Compact code partitions fragmented by [[append]]s — content- and
    * epoch-preserving (see [[PqIndex.compact]]). */
  def compact(maxFiles: Int = 1): Long = pq.compact("cell", maxFiles)

  private def parentEpoch(): IndexEpoch = ivf.epoch().getOrElse(
    throw new IllegalStateException(
      "parent IVF index has no epoch — build it before the IVFPQ sibling"))

  private def recordParentEpoch(): Unit =
    IndexEpoch.write(spark, epochRecordPath, parentEpoch())

  /** True when the codes exist and were encoded against the parent's
    * CURRENT epoch — the caller-facing build-once guard (the epoch
    * record is written last, so its match implies complete artifacts). */
  def isFresh(): Boolean =
    IndexEpoch.read(spark, epochRecordPath).exists(r => ivf.epoch().contains(r))

  private def residuals(assigned: DataFrame, idCol: String,
                        vecCol: String): DataFrame = {
    val cents = ivf.centroids().withColumnRenamed("centroid", "_cent")
    assigned.join(broadcast(cents), "cell")
      .select(col(idCol), col("cell"),
        zip_with(col(vecCol).cast("array<double>"), col("_cent"),
          (a, b) => a - b).as("residual"))
  }

  /** Train the residual codebooks and encode the indexed corpus. With
    * `rotate`, residuals are OPQ-rotated before the subspace split —
    * orthonormal R preserves inner products, so ADC on R·r against the
    * rotated query still estimates IP(q, r). */
  def build(idCol: String, vecCol: String,
            m: Int = 8, k: Int = 64, iters: Int = 3,
            trainSample: Int = 65536, rotate: Boolean = false,
            rotSample: Int = 65536): Unit = {
    val epochAtStart = parentEpoch()
    pq.build(residuals(ivf.cells(), idCol, vecCol), idCol, "residual",
      m, k, iters, partitionBy = Some("cell"),
      trainSample = trainSample, rotate = rotate, rotSample = rotSample)
    IndexEpoch.write(spark, epochRecordPath, epochAtStart)
  }

  /** Residual-encode ONLY the delta against the frozen codebooks into
    * its cell partitions (the FAISS `add` analog) and advance the
    * recorded epoch. Valid only while the parent's build token is
    * unchanged (appends, not retrains) AND exactly one parent append is
    * outstanding: call AFTER each `ivf.append(delta)` with the same
    * rows. A larger gap means an earlier parent delta was never encoded
    * here — stamping the current epoch would forgive the missing rows
    * forever (silent candidate loss, the exact hazard this class
    * refuses); a zero gap means the parent append has not happened yet,
    * and stamping now would double-encode on the inevitable retry. */
  def append(emb: DataFrame, idCol: String, vecCol: String): Unit = {
    val parent = parentEpoch()
    val recorded = IndexEpoch.read(spark, epochRecordPath).getOrElse(
      throw new IllegalStateException(
        s"no IVFPQ codes at $pqBase — run build, not append"))
    if (recorded.buildToken != parent.buildToken)
      throw new IllegalStateException(
        "parent IVF index was re-trained since these codes were built — " +
          "the residual codebooks quantize a different distribution; run " +
          "IvfPq.build, not append")
    // cv must match too, or an append would LAUNDER a recenter/split
    // into a stamped-fresh epoch: the mods-gap check below passes after
    // recenter + ivf.append, and stamping the parent epoch here would
    // certify every pre-recenter code in the recentred cells (taken
    // against the old centroids) as fresh — the silent-candidate-loss
    // hazard this class exists to refuse
    if (recorded.cv != parent.cv)
      throw new IllegalStateException(
        s"parent centroids moved (cv ${recorded.cv} -> ${parent.cv}: a " +
          "recenter or cell split) since these codes were recorded — " +
          "run IvfPq.refreshRecentered immediately after a recenter " +
          "(before any parent append), or IvfPq.build after a split")
    if (parent.mods != recorded.mods + 1)
      throw new IllegalStateException(
        s"parent IVF index has ${parent.mods} appends but these codes " +
          s"record ${recorded.mods} — append exactly once after each " +
          "ivf.append (a wider gap means an earlier delta was never " +
          "encoded; run IvfPq.build to resynchronize)")
    val assigned = ivf.assignStored(emb, idCol, vecCol)
      .withColumnRenamed("_vec", "_av")
    pq.encode(residuals(assigned, idCol, "_av"), idCol, "residual",
      partitionBy = Some("cell"), mode = SaveMode.Append)
    IndexEpoch.write(spark, epochRecordPath, parent)
  }

  /** Incremental refresh after a parent RECENTER
    * ([[IvfIndex.recenter]]): rows never moved cells — only the
    * recentred cells' centroids did, so only THOSE cells' residuals
    * (and codes) are stale. This diffs the recorded-cv and current-cv
    * routing tables, re-encodes exactly the changed cells against the
    * frozen codebooks (dynamic partition overwrite — every unchanged
    * cell's code files stay byte-identical), and stamps the parent's
    * current epoch. Cost is one partition-pruned pass over the
    * recentred cells; at scale that is the drifted percent, not the
    * corpus — the alternative was a full [[build]].
    *
    * Valid only when build token AND mods match (same rows, same
    * coarse quantizer training) and only cv moved; a parent whose
    * recorded-cv centroid dir has been swept (reader lagged more than
    * one maintenance generation) throws — run [[build]]. Probes refuse
    * throughout the refresh (epoch mismatch) and a crash mid-overwrite
    * retries to the same result (frozen codebooks, deterministic
    * encode). Returns the re-encoded cell ids. */
  def refreshRecentered(idCol: String, vecCol: String): Seq[Int] = {
    val parent = parentEpoch()
    val recorded = IndexEpoch.read(spark, epochRecordPath).getOrElse(
      throw new IllegalStateException(
        s"no IVFPQ codes at $pqBase — run build, not refreshRecentered"))
    if (recorded == parent) return Nil // already fresh
    if (recorded.buildToken != parent.buildToken ||
        recorded.mods != parent.mods)
      throw new IllegalStateException(
        "parent IVF index was re-trained or its rows moved cells since " +
          "these codes were built (token/mods mismatch) — " +
          "refreshRecentered only repairs a recenter; run IvfPq.build " +
          "or IvfPq.append")
    def table(df: DataFrame): Map[Int, Seq[Double]] =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    val newCents = table(ivf.centroids())
    val oldCents = table(ivf.centroidsAt(recorded.cv).getOrElse(
      throw new IllegalStateException(
        s"centroid version ${recorded.cv} swept at the parent — these " +
          "codes lag more than one maintenance generation; run " +
          "IvfPq.build")))
    val changed = newCents.keys.toSeq
      .filter(c => oldCents.get(c).exists(_ != newCents(c))).sorted
    if (changed.nonEmpty)
      pq.reencodePartitions(
        residuals(ivf.cells().filter(col("cell").isin(changed: _*))
            .select(col(idCol), col("cell"),
              col(vecCol).cast("array<double>").as(vecCol)),
          idCol, vecCol),
        idCol, "residual", "cell")
    IndexEpoch.write(spark, epochRecordPath, parent)
    changed
  }

  /** Probe: coarse cell choice as in [[IvfIndex.search]]; ADC over the
    * probed cells' codes (LUT from the ORIGINAL query against the
    * residual codebooks, plus the per-cell IP(q, centroid) constant so
    * multi-cell probes rank on one scale); exact re-rank of the top
    * `rerank` rows. Refuses loudly on a stale epoch — silent candidate
    * loss is the one failure mode an ANN index must not have. */
  def search(idCol: String, vecCol: String, query: Seq[Double],
             k: Int, rerank: Int, nprobe: Int = 1): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val recorded = IndexEpoch.read(spark, epochRecordPath)
    val parent = ivf.epoch()
    if (recorded.isEmpty || recorded != parent)
      throw new IllegalStateException(
        s"stale IVFPQ codes at $pqBase: parent epoch $parent, codes " +
          s"recorded $recorded — rebuild (IvfPq.build) or encode the " +
          "parent's delta (IvfPq.append)")
    val q = array(query.map(lit): _*)
    val best = ivf.probeCells(query, nprobe)
    // per-cell constant IP(q, centroid), 6-dp like every ADC term —
    // from the parent's driver-side centroid cache (no Spark job)
    val cents = ivf.centroidArray()
      .map { case (cell, c) => (cell, c.toSeq) }.toMap
    val cellConst = best.map { c =>
      c -> BigDecimal(query.zip(cents(c)).map { case (a, b) => a * b }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val constCol = best.tail.foldLeft(
      lit(cellConst(best.head))) { (acc, c) =>
      when(col("cell") === c, lit(cellConst(c))).otherwise(acc)
    }
    // committed-only read (r18): the codes table is swap- and
    // appendOnce-maintained — a probe racing a killed maintenance op
    // must see neither a partial delta nor a torn swap
    val cand = pq.committedCodes().filter(col("cell").isin(best: _*))
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
