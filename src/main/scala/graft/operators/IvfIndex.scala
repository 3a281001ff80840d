package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF (inverted-file) ANN index: the build-once / probe-many
  * scale path for similarity search. `Similarity.ivfTopK` derives cells
  * from a pre-existing label; real corpora have no labels, so this
  * builds the coarse quantizer itself with a declarative Lloyd k-means
  * and materializes BOTH artifacts:
  *
  *   `<base>/ivf_cells`      — the corpus with its assigned cell id,
  *                             parquet partitioned BY cell, so a probe
  *                             reads only `nprobe` partitions;
  *   `<base>/ivf_centroids`  — k centroid vectors (tiny, broadcast).
  *
  * Search cost: rank k centroids against the query (k rows), then scan
  * only the chosen cells — corpus-size-independent candidate selection,
  * the same shape FAISS IVF uses, expressed as partition pruning.
  *
  * K-means notes (all DataFrame ops, no MLlib): assignment broadcasts
  * the centroid TABLE and computes the per-row argmin over k squared-L2
  * distances — dist² = |c|² − 2·x·c (|x|² is row-constant) — as a
  * `min(struct(dist, cell))` aggregate over the broadcast crossJoin.
  * The k-way row replication is collapsed back to one row per id by the
  * PARTIAL aggregate before any exchange, and the plan stays O(1) in k
  * (the centroids travel as broadcast data, not as an O(k·dim)
  * expression tree — the literal-inlining formulation re-planned a
  * k×dim expression every Lloyd round, a driver planning bomb at
  * realistic k). Update is the posexplode/avg used by
  * `Similarity.centroids`. Deterministic: seeded init picks the k
  * hash-smallest rows; ties in argmin break to the lower cell id
  * (struct ordering compares dist, then cell).
  */
final class IvfIndex(spark: SparkSession, basePath: String) {

  private def cellsPath = s"$basePath/ivf_cells"
  private def centroidsPath = s"$basePath/ivf_centroids"

  /** Broadcastable centroid table. |c|² computed driver-side in array
    * order — identical doubles to an executor-side fold, and k tiny
    * numbers ride the broadcast for free. */
  private def centroidFrame(cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cents.map { case (i, c) => (i, c, c.map(x => x * x).sum) }
      .toDF("_ccell", "_cvec", "_cn2")
  }

  /** (id, nearest-cell, vec) via broadcast centroid table + argmin
    * aggregate. One shuffle of one row per input row; centroid count
    * only affects per-task compute and broadcast size. */
  private def assignments(emb: DataFrame, idCol: String, vecCol: String,
                          cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val cdf = centroidFrame(cents)
    emb.select(col(idCol).as("_aid"),
        col(vecCol).cast("array<double>").as("_av"))
      .crossJoin(broadcast(cdf))
      .select(col("_aid"), col("_av"),
        struct(
          (col("_cn2") - VectorFunctions.dot(col("_av"), col("_cvec")) * 2)
            .as("dist"),
          col("_ccell").as("idx")).as("_s"))
      .groupBy(col("_aid"))
      .agg(min(col("_s")).as("_best"), first(col("_av")).as("_av"))
      .select(col("_aid"), col("_best.idx").as("_cell"), col("_av"))
  }

  /** Build the index: k-means the corpus into `k` cells, persist cells
    * (partitioned by cell) + centroids. */
  def build(emb: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 5): Unit = {
    // deterministic seeded init: k hash-smallest vectors
    var cents: Seq[(Int, Seq[Double])] = emb
      .select(col(vecCol).cast("array<double>").as("v"))
      .withColumn("_h", xxhash64(col("v")))
      .orderBy(col("_h")).limit(k)
      .select("v").collect()
      .map(_.getSeq[Double](0).toSeq).zipWithIndex.map(_.swap).toSeq

    for (_ <- 1 to iters) {
      // two shuffles per Lloyd round (argmin by id, means by cell/dim);
      // the (cell, dim) means are k×dim rows — collect them directly and
      // assemble the centroid arrays driver-side instead of paying a
      // third shuffle for the array_sort/collect_list regroup
      val means = assignments(emb, idCol, vecCol, cents)
        .select(col("_cell"), posexplode(col("_av")).as(Seq("_pos", "_x")))
        .groupBy(col("_cell"), col("_pos")).agg(avg(col("_x")).as("_m"))
        .collect()
      val byIdx = means.groupBy(_.getInt(0)).map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      // empty cells keep their previous centroid
      cents = cents.map { case (i, c) => (i, byIdx.getOrElse(i, c)) }
    }

    writeAssigned(emb, idCol, vecCol, cents, SaveMode.Overwrite)
    import spark.implicits._
    cents.map { case (i, c) => (i, c) }.toDF("cell", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(centroidsPath)
    invalidateSq() // cell contents changed — a stale sibling would serve wrong candidates
  }

  /** Assign every row to its nearest centroid and write to the cell
    * partitions. Carries the ORIGINAL row through the argmin aggregate
    * (struct pass-through) instead of joining assignments back to the
    * corpus — one corpus shuffle, not two, and the stored vector keeps
    * its source type (float) rather than the double working copy.
    * `idCol` must be unique (the aggregate keys on it — duplicate ids
    * would collapse to one arbitrary survivor; an ANN index keyed by a
    * non-unique id is broken regardless of this implementation). */
  private def writeAssigned(emb: DataFrame, idCol: String, vecCol: String,
                            cents: Seq[(Int, Seq[Double])],
                            mode: SaveMode): Unit = {
    val inputCols = emb.columns.toSeq
    val cdf = centroidFrame(cents)
    emb.select(col(idCol).as("_aid"),
        struct(inputCols.map(col): _*).as("_row"),
        col(vecCol).cast("array<double>").as("_av"))
      .crossJoin(broadcast(cdf))
      .select(col("_aid"), col("_row"),
        struct(
          (col("_cn2") - VectorFunctions.dot(col("_av"), col("_cvec")) * 2)
            .as("dist"),
          col("_ccell").as("idx")).as("_s"))
      .groupBy(col("_aid"))
      .agg(min(col("_s")).as("_best"), first(col("_row")).as("_row"))
      .select(inputCols.map(c => col(s"_row.$c")) :+
        col("_best.idx").as("cell"): _*)
      .write.mode(mode).partitionBy("cell").parquet(cellsPath)
  }

  def centroids(): DataFrame = spark.read.parquet(centroidsPath)
  def cells(): DataFrame = spark.read.parquet(cellsPath)

  /** Append-only refresh: assign the delta to the EXISTING stored
    * centroids (no re-training) and add its rows to the cell partitions.
    * The quantizer is frozen — the standard IVF ingestion path (FAISS
    * `add` after `train`): cell quality degrades only as far as the
    * corpus distribution drifts from the training sample, and a periodic
    * full `build` re-trains. Touches only the delta's cell partitions. */
  def append(emb: DataFrame, idCol: String, vecCol: String): Unit = {
    val cents = centroids().collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
      .sortBy(_._1)
    writeAssigned(emb, idCol, vecCol, cents, SaveMode.Append)
    invalidateSq() // appended rows are not in the sibling yet
  }

  /** Compact fragmented cell partitions after appends — the IVF analog
    * of [[LshIndex.compact]] (see there for the lineage-truncation and
    * non-atomicity notes). Rewrites only cells holding more than
    * `maxFiles` files; returns how many were rewritten. */
  def compact(maxFiles: Int = 1): Long = {
    val frag = cells()
      .select(col("cell"), input_file_name().as("_f"))
      .groupBy(col("cell")).agg(countDistinct(col("_f")).as("_nf"))
      .filter(col("_nf") > maxFiles)
      .select(col("cell"))
      .localCheckpoint()
    val n = frag.count()
    if (n > 0) {
      val compacted = cells()
        .join(broadcast(frag), Seq("cell"), "left_semi")
        .repartition(col("cell"))
        .localCheckpoint()
      compacted.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(cellsPath)
    }
    n
  }

  /** Probe: rank cells by centroid cosine, brute-force only the best
    * `nprobe` cells (partition-pruned scan). */
  def search(idCol: String, vecCol: String, query: Seq[Double], k: Int,
             nprobe: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val best = probeCells(q, nprobe)
    cells().filter(col("cell").isin(best: _*))
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Cell choice shared by the float and quantized probes: rank the k
    * centroids (tiny table) by cosine to the query. */
  private[operators] def probeCells(q: org.apache.spark.sql.Column, nprobe: Int): Seq[Int] =
    centroids()
      .select(col("cell"), VectorFunctions.cosineRounded(col("centroid"), q).as("_cs"))
      .orderBy(col("_cs").desc, col("cell").asc)
      .limit(nprobe).select("cell")
      .collect().map(_.getInt(0)).toSeq

  private def sqCellsPath = s"$basePath/ivf_cells_sq"
  private def sqMetaPath = s"$basePath/ivf_sq_meta"

  /** Drop the quantized sibling so the next [[ensureSq]] rebuilds it —
    * called by [[build]] and [[append]]: the sibling mirrors the cell
    * table, and serving stale int8 candidates after the cells changed
    * would be a silent-wrong-results bug, not a perf bug. */
  private def invalidateSq(): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(sqCellsPath, sqMetaPath).foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      if (fs.exists(path)) fs.delete(path, true)
    }
  }

  /** Build the int8 sibling of the cell table (the FAISS IVF-SQ8 shape):
    * per row (id, q) with symmetrically quantized tinyint components,
    * partitioned by the SAME cell ids — 4× fewer vector bytes than the
    * float column, and the quantized probe's candidate pass reads ONLY
    * this table. Build-once (`_SUCCESS`-guarded); the quantizer scale
    * source (max |component| over the stored corpus) is persisted
    * alongside so probes never rescan the corpus for it. */
  def ensureSq(idCol: String, vecCol: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val done = new org.apache.hadoop.fs.Path(sqCellsPath, "_SUCCESS")
    if (!done.getFileSystem(conf).exists(done)) {
      val maxAbs = Similarity.sqMaxAbs(cells(), vecCol)
      cells()
        .select(col(idCol), col("cell"),
          Similarity.sqQuantize(col(vecCol), maxAbs)
            .cast("array<tinyint>").as("q"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(sqCellsPath)
      import spark.implicits._
      Seq(maxAbs).toDF("max_abs").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(sqMetaPath)
    }
  }

  /** Drift report: how far each cell's CURRENT mean vector has moved
    * from the stored (training-time) centroid, as cosine similarity.
    * The re-train trigger for the frozen-quantizer append path: appends
    * assign to training-time centroids ([[append]]), so cell quality
    * decays exactly as the corpus distribution drifts — when a cell's
    * drift cosine drops below a threshold, rebuild. One aggregate over
    * the cells (per-(cell, dim) means, map-side combinable) joined to
    * the k-row centroid table; output is k rows. */
  def drift(vecCol: String, minCosine: Double = 0.99): DataFrame = {
    val current = Similarity.centroids(cells(), "cell", vecCol)
      .withColumnRenamed("centroid", "_cur")
    centroids().join(current, "cell")
      .select(col("cell"),
        VectorFunctions.cosineRounded(col("centroid"), col("_cur"))
          .as("drift_cosine"))
      .withColumn("retrain", col("drift_cosine") < minCosine)
  }

  /** Quantized probe (IVF × SQ8): cell pruning as in [[search]], then
    * the candidate pass ranks the probed cells by the INT8 dot product
    * over the quantized sibling table (a quarter of the float bytes,
    * same partition pruning), and only the best `rerank` rows are
    * re-ranked at full precision against the float cells. Exact integer
    * arithmetic + total tie-orders keep the whole pipeline
    * deterministic and oracle-replayable. Requires [[ensureSq]]. */
  def searchQuantized(idCol: String, vecCol: String, query: Seq[Double],
                      k: Int, rerank: Int, nprobe: Int = 1): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val maxAbs = spark.read.parquet(sqMetaPath).head().getDouble(0)
    val q = array(query.map(lit): _*)
    val qq = Similarity.sqQuantize(q, maxAbs)
    val best = probeCells(q, nprobe)
    val cand = spark.read.parquet(sqCellsPath)
      .filter(col("cell").isin(best: _*))
      .select(col(idCol), VectorFunctions.dot(col("q"), qq).as("_qdot"))
      .orderBy(col("_qdot").desc, col(idCol).asc)
      .limit(rerank)
      .select(col(idCol))
    cells().filter(col("cell").isin(best: _*))
      .join(broadcast(cand), idCol)
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
