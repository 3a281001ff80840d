package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque staleness token for an index and the artifacts derived from
  * it. `buildToken` is fresh per (re)train — a derived artifact recorded
  * under a different token was encoded against a different quantizer;
  * `mods` counts appends since that build — a lower recorded `mods`
  * means the derived artifact is missing rows. Tokens are random (not a
  * counter) so deleting and rebuilding the parent can never collide
  * with a sibling's stale recording. */
final case class IndexEpoch(buildToken: String, mods: Long)

private[operators] object IndexEpoch {
  /** None on absence AND on any malformed content: a torn file must
    * read as "no epoch" (parents rebuild, siblings read stale and
    * rebuild — the safe direction), never as a smaller mods count
    * (which would certify stale codes as fresh) or an uncaught parse
    * exception (which would wedge the build-once guard). */
  def read(spark: SparkSession, path: String): Option[IndexEpoch] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      txt.split(' ') match {
        case Array(tok, mods) => scala.util.Try(mods.toLong).toOption
          .map(IndexEpoch(tok, _))
        case _ => None
      }
    }
  }

  /** Write-temp-then-rename so a crash can never leave a torn epoch in
    * place — the destination either holds the previous complete value,
    * is briefly absent (reads as stale — safe), or holds the new one. */
  def write(spark: SparkSession, path: String, e: IndexEpoch): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(s"${e.buildToken} ${e.mods}".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not move epoch into place: $path")
  }
}

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
  private def epochPath = s"$basePath/ivf_epoch"

  /** Current epoch, or None when no complete index exists. The epoch
    * file is written LAST in [[build]], so its presence implies the
    * cells and centroids artifacts are complete — callers can use
    * `epoch().isDefined` as the build-once guard. */
  def epoch(): Option[IndexEpoch] = IndexEpoch.read(spark, epochPath)

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

  /** Build the index: k-means a bounded deterministic sample into `k`
    * centroids driver-side ([[KMeans]] — the FAISS shape: train is
    * single-node over `trainSample` rows, only the assignment/encode
    * pass touches the full corpus), then assign and persist cells
    * (partitioned by cell) + centroids. At 100 TB the former
    * full-corpus distributed Lloyd loop paid 2·iters corpus shuffles
    * for quantizer training nobody runs at that scale; this pays one
    * TakeOrdered sample collect plus the single assignment pass. */
  def build(emb: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 5, trainSample: Int = 65536): Unit = {
    val sample = Sampling.exactSample(
        emb.select(col(idCol), col(vecCol)), idCol, trainSample)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val cents: Seq[(Int, Seq[Double])] =
      KMeans.lloyd(sample, k, iters).zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq

    writeAssigned(emb, idCol, vecCol, cents, SaveMode.Overwrite)
    import spark.implicits._
    cents.map { case (i, c) => (i, c) }.toDF("cell", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(centroidsPath)
    invalidateSq() // cell contents changed — a stale sibling would serve wrong candidates
    // fresh token LAST: derived artifacts recorded under the old token
    // now read as stale, and the file's presence certifies a complete
    // build (a crash above leaves no epoch — the next build retries)
    IndexEpoch.write(spark, epochPath,
      IndexEpoch(java.util.UUID.randomUUID().toString, 0L))
  }

  /** Assign every row to its nearest centroid and write to the cell
    * partitions. Carries the ORIGINAL row through the argmin aggregate
    * (struct pass-through) instead of joining assignments back to the
    * corpus — one corpus shuffle, not two, and the stored vector keeps
    * its source type (float) rather than the double working copy.
    * `idCol` must be unique (the aggregate keys on it — duplicate ids
    * would collapse to one arbitrary survivor; an ANN index keyed by a
    * non-unique id is broken regardless of this implementation). */
  private def assignedFrame(emb: DataFrame, idCol: String, vecCol: String,
                            cents: Seq[(Int, Seq[Double])]): DataFrame = {
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
      // cluster by cell before the partitioned write: without it every
      // shuffle partition writes a fragment into every cell dir
      // (cells × partitions small files — measured 58 files for 8 cells
      // at sf0.1), and every probe pays the listing + per-file task
      // overhead. One extra build-time shuffle buys minimal files per
      // cell; at real scale spark.sql.files.maxRecordsPerFile re-splits
      // a hot cell into right-sized files.
      .repartition(col("cell"))
  }

  private def writeAssigned(emb: DataFrame, idCol: String, vecCol: String,
                            cents: Seq[(Int, Seq[Double])],
                            mode: SaveMode): Unit =
    assignedFrame(emb, idCol, vecCol, cents)
      .write.mode(mode).partitionBy("cell").parquet(cellsPath)

  def centroids(): DataFrame = spark.read.parquet(centroidsPath)

  /** Committed-only read of the cell table: the cells path is
    * appendOnce-maintained (see [[append]]), so a probe racing a
    * killed-then-retried append must never see the partial rename —
    * same contract as [[LshIndex.rows]] (StagedCommit.readCommitted).
    * Build part files (non-delta) are always included; delta files
    * only when their `_delta_<token>_SUCCESS` marker exists. */
  def cells(): DataFrame = StagedCommit.readCommitted(spark, cellsPath)

  /** Append-only refresh: assign the delta to the EXISTING stored
    * centroids (no re-training) and add its rows to the cell partitions.
    * The quantizer is frozen — the standard IVF ingestion path (FAISS
    * `add` after `train`): cell quality degrades only as far as the
    * corpus distribution drifts from the training sample, and a periodic
    * full `build` re-trains. Touches only the delta's cell partitions. */
  def append(emb: DataFrame, idCol: String, vecCol: String): Unit = {
    // validate BEFORE mutating: appending into a half-built index (no
    // epoch — a crashed build) would add rows no epoch accounts for and
    // wipe the SQ sibling, then throw anyway
    val e = epoch().getOrElse(
      throw new IllegalStateException(s"no complete IVF index at $basePath"))
    // exactly-once delta via StagedCommit (VERDICT r12 next-list #5):
    // the assigned delta stages into a hidden subtree, renames in, and
    // only then gains its _SUCCESS marker — [[cells]] reads committed
    // files only, so a probe never sees a killed append's partial
    // rename, and a redelivered batch (same content token) is a no-op.
    //
    // Invalidation ordering: the SQ wipe and the mods bump run
    // UNCONDITIONALLY, sibling-wipe first — a crash between the
    // marker commit and a conditional invalidation would leave the
    // int8 sibling certified fresh while missing the appended rows
    // FOREVER (the retry would no-op past the `if`). A redelivered
    // no-op append re-wiping the sibling costs one rebuild;
    // over-invalidation is the safe direction.
    invalidateSq()
    val token = StagedCommit.idToken(emb, idCol, vecCol)
    StagedCommit.appendOnce(cellsPath, token, Seq("cell"),
      assignedFrame(emb, idCol, vecCol, storedCentroids()))
    IndexEpoch.write(spark, epochPath, e.copy(mods = e.mods + 1))
  }

  private def storedCentroids(): Seq[(Int, Seq[Double])] =
    centroids().collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
      .sortBy(_._1)

  /** Frozen-quantizer assignment of arbitrary rows against the STORED
    * centroids — the same argmin [[append]] uses, exposed so derived
    * artifacts ([[IvfPq.append]]) can encode a delta into the exact
    * cells the parent filed it under. Output: (`idCol`, cell, vector as
    * array&lt;double&gt;). */
  private[operators] def assignStored(emb: DataFrame, idCol: String,
                                      vecCol: String): DataFrame =
    assignments(emb, idCol, vecCol, storedCentroids())
      .select(col("_aid").as(idCol), col("_cell").as("cell"),
        col("_av").as("_vec"))

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
    val best = probeCells(query, nprobe)
    cells().filter(col("cell").isin(best: _*))
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** The centroid table, collected once per build epoch and cached on the
    * driver — the FAISS shape: the coarse quantizer is an in-memory
    * routing table (k centroids, bounded by construction), only cell
    * CONTENTS live distributed. Cache keyed by the epoch file (a raw FS
    * read, no Spark job), so a rebuild or append in another instance is
    * picked up and a same-epoch probe costs zero jobs for cell choice —
    * per-search centroid-ranking jobs were pure fixed overhead. Sorted
    * by cell for deterministic iteration. */
  @volatile private var centroidCache: (String, Array[(Int, Array[Double])]) = null

  private[operators] def centroidArray(): Array[(Int, Array[Double])] = {
    val tok = epoch().map(e => s"${e.buildToken}:${e.mods}").getOrElse("")
    val cached = centroidCache
    if (cached != null && cached._1 == tok) cached._2
    else {
      val a = centroids().collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      centroidCache = (tok, a)
      a
    }
  }

  /** Cell choice shared by the float and quantized probes: rank the k
    * cached centroids by cosine to the query, driver-side. Arithmetic
    * replicates the previous distributed form bit-for-bit — VecDot's
    * sequential in-order double fold, cosine as dot/(norm·norm), then
    * `round(_, 6)` via the same scala-BigDecimal HALF_UP Spark's Round
    * applies to doubles — so cell choice stays byte-identical and the
    * oracle's SQL replay from the stored centroid table keeps matching. */
  private[operators] def probeCells(query: Seq[Double], nprobe: Int): Seq[Int] = {
    val qa = query.toArray
    def d(x: Array[Double], y: Array[Double]): Double = {
      val n = math.min(x.length, y.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i) * y(i); i += 1 }
      s
    }
    val qn = math.sqrt(d(qa, qa))
    centroidArray()
      .map { case (cell, c) =>
        (cell, BigDecimal(d(c, qa) / (math.sqrt(d(c, c)) * qn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (cell, cs) => (-cs, cell) }
      .take(nprobe).map(_._1).toSeq
  }

  private def sqCellsPath = s"$basePath/ivf_cells_sq"
  private def sqMetaPath = s"$basePath/ivf_sq_meta"

  /** Drop the quantized sibling so the next [[ensureSq]] rebuilds it —
    * called by [[build]] and [[append]]: the sibling mirrors the cell
    * table, and serving stale int8 candidates after the cells changed
    * would be a silent-wrong-results bug, not a perf bug.
    *
    * Staleness is two-tier BY DESIGN: artifacts this index OWNS (the SQ
    * sibling, stored under its own base path) are deleted directly —
    * the owner knows where they live and deletion is strictly better
    * than refusal; derived artifacts it CANNOT know about (the IVFPQ
    * codes live under an arbitrary caller-chosen path) check the
    * [[IndexEpoch]] stamped here and refuse loudly on mismatch. */
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
      // meta BEFORE cells: the build-once guard is the cells _SUCCESS,
      // so the last-written artifact must be the guarded one — the
      // reverse order left a crash window where the guard passed but
      // searchQuantized threw forever on the missing meta file
      import spark.implicits._
      Seq(maxAbs).toDF("max_abs").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(sqMetaPath)
      cells()
        .select(col(idCol), col("cell"),
          Similarity.sqQuantize(col(vecCol), maxAbs)
            .cast("array<tinyint>").as("q"))
        // cluster by cell: same minimal-files-per-partition rationale as
        // writeAssigned — the quantized probe pays file listing too
        .repartition(col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(sqCellsPath)
    }
  }

  /** Drift report: how far each cell's CURRENT mean vector has moved
    * from the stored (training-time) centroid, as cosine similarity.
    * The re-train trigger for the frozen-quantizer append path: appends
    * assign to training-time centroids ([[append]]), so cell quality
    * decays exactly as the corpus distribution drifts — when a cell's
    * drift cosine drops below a threshold, rebuild. One aggregate over
    * the cells (per-(cell, dim) integer sums, map-side combinable),
    * driver-side cosine against the k stored centroids; output is k
    * rows. */
  def drift(vecCol: String, minCosine: Double = 0.99): DataFrame = {
    // Per-(cell, dim) means from EXACT integer sums of 1e-6-quantized
    // components: integer addition is order-independent, so the means
    // are bit-identical in any engine and on any partitioning — a live
    // float avg() here made the 6-dp cosine (and the retrain flag) hang
    // on partition-order ULP noise. k×dim rows collect driver-side
    // (control-plane sized, like build's centroids) and the cosine is
    // assembled in deterministic array order.
    val mRows = cells()
      .select(col("cell"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")))
      .groupBy(col("cell"), col("_i"))
      .agg(sum(round(col("_x") * 1e6).cast("long")).as("_s"),
        count(lit(1)).as("_n"))
      .collect()
    val current: Map[Int, Array[Double]] =
      mRows.groupBy(_.getInt(0)).map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1))
          .map(r => r.getLong(2).toDouble / (r.getLong(3) * 1e6)).toArray
      }
    val rows = storedCentroids().flatMap { case (cell, stored) =>
      current.get(cell).map { cur =>
        val dot = stored.iterator.zip(cur.iterator).map { case (a, b) => a * b }.sum
        val n1 = math.sqrt(stored.map(x => x * x).sum)
        val n2 = math.sqrt(cur.map(x => x * x).sum)
        val cos = BigDecimal(dot / (n1 * n2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cell, cos, cos < minCosine)
      }
    }
    import spark.implicits._
    rows.toDF("cell", "drift_cosine", "retrain")
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
    val best = probeCells(query, nprobe)
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
