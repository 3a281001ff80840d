package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent product-quantization index (the FAISS PQ shape): vectors
  * compressed to one code per subspace, searched with asymmetric
  * distance computation (ADC).
  *
  * Build: train `m` independent codebooks (k codewords each) with
  * driver-side Lloyd k-means over a bounded deterministic sample
  * ([[KMeans]] — training never scans the corpus; only the encode pass
  * does), optionally preceded by an OPQ-lite rotation ([[Opq]]: PCA +
  * balanced eigenvalue allocation, applied as one orthonormal column
  * transform before the subspace split). Store
  *
  *   `<base>/pq_rotation` — (only when rotated) the dim×dim matrix as
  *                          1e6-scaled integers: query rotation replays
  *                          as EXACT fixed-point arithmetic in any
  *                          engine;
  *   `<base>/pq_codebook` — m·k codeword rows (subspace, code, centroid);
  *   `<base>/pq_codes`    — per corpus row the m-byte code word
  *                          (`array<tinyint>`): dim×4 bytes → m bytes,
  *                          a 32× compression at dim=64/m=8.
  *
  * Codes are written LAST: callers' build-once guard is the codes
  * `_SUCCESS`, whose presence must imply the rotation and codebook
  * artifacts are complete.
  *
  * Search (ADC): the query is NOT quantized — (rotated, then) per
  * subspace its dot product against all k codewords forms a lookup
  * table (m·k doubles, driver-side, rounded to 6 dp so any engine
  * reproduces the entries from the stored artifacts); a row's
  * approximate score is the sum of its m table hits, a flat codegen'd
  * expression over the codes column. The scan reads ONLY the m-byte
  * codes; the float column is touched just for the `rerank` survivors,
  * re-ranked at full precision against the ORIGINAL (unrotated)
  * vectors — an orthonormal rotation preserves inner products, so
  * candidates selected in rotated space re-rank on the true scores.
  *
  * The codebook is trained data, so determinism of SEARCH never depends
  * on k-means internals: the oracle replays rotation + ADC + re-rank
  * from the stored artifacts exactly as probes do.
  */
final class PqIndex(spark: SparkSession, basePath: String) {

  private def codebookPath = s"$basePath/pq_codebook"
  private def codesPath = s"$basePath/pq_codes"
  private def rotationPath = s"$basePath/pq_rotation"

  /** Train the m codebooks and encode the corpus. `partitionBy` writes
    * the codes table partitioned by an input column (e.g. an IVF cell
    * id) so a pruned probe reads only its partition's codes.
    * `trainSample` bounds the rows collected for training (FAISS
    * trains on a sample for the same reason — m·iters full-corpus
    * passes are indefensible at scale); `rotate` trains and applies the
    * OPQ-lite rotation, whose covariance accumulation is capped
    * separately at `rotSample` rows (a deterministic prefix of the
    * training sample — O(n·dim²) driver work deserves its own bound). */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, k: Int = 16, iters: Int = 4,
            partitionBy: Option[String] = None,
            trainSample: Int = 65536, rotate: Boolean = false,
            rotSample: Int = 65536): Unit = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim ($dim) must divide into m ($m) subspaces")
    // codes are stored as signed bytes: codewords above 127 would wrap
    // negative and corrupt ADC's 1-based LUT indexing silently
    require(k >= 1 && k <= 128, s"codewords per subspace must be in [1,128]: $k")
    val subDim = dim / m
    val sample = Sampling.exactSample(
        emb.select(col(idCol), col(vecCol)), idCol, trainSample)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

    // a REBUILD at an existing path must first drop the old codes: the
    // write-last ordering below only protects a first build — without
    // this, a crash between the codebook overwrite and the codes write
    // leaves OLD codes whose surviving _SUCCESS satisfies callers'
    // build-once guard against the NEW codebook
    val codesDir = new org.apache.hadoop.fs.Path(codesPath)
    val codesFs = codesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (codesFs.exists(codesDir)) codesFs.delete(codesDir, true)

    // rotation artifact first (the encode pass reads it back), codebook
    // second, codes last — see the ordering contract in the class doc.
    // The rotation trains on a PREFIX of the (deterministically ordered)
    // sample: its driver-side covariance is O(n·dim²), so it gets its
    // own, typically smaller, cap than the codebooks' Lloyd input
    val rotOpt =
      if (rotate) Some(Opq.trainRotation(sample.take(rotSample), m)) else None
    import spark.implicits._
    rotOpt match {
      case Some(rot) =>
        rot.zipWithIndex.toSeq.map { case (row, i) => (i + 1, row.toSeq) }
          .toDF("i", "r")
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(rotationPath)
      case None =>
        // a previous rotated build at this path must not leak its matrix
        // into this unrotated one
        val p = new org.apache.hadoop.fs.Path(rotationPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
    }

    val trainPts = rotOpt.map(r => sample.map(Opq.apply(r, _))).getOrElse(sample)
    val codebooks: Seq[Seq[(Int, Seq[Double])]] = (0 until m).map { j =>
      KMeans.lloyd(trainPts.map(_.slice(j * subDim, (j + 1) * subDim)), k, iters)
        .zipWithIndex.map { case (c, code) => (code, c.toSeq) }.toSeq
    }
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.map { case (code, c) => (j, code, c) }
    }.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(codebookPath)

    encodeWith(emb, idCol, vecCol, codebooks, partitionBy, SaveMode.Overwrite)
  }

  /** Encode rows against the STORED codebooks — no training, the FAISS
    * `add` analog. Appends by default: the incremental path encodes
    * ONLY the delta (a rebuilt-from-scratch codes table re-encodes the
    * whole corpus for rows whose codes cannot have changed). The caller
    * owns id-disjointness with the existing codes. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             partitionBy: Option[String] = None,
             mode: SaveMode = SaveMode.Append): Unit =
    encodeWith(emb, idCol, vecCol, storedCodebooks(), partitionBy, mode)

  /** Frozen-codebook EXACTLY-ONCE append — the FAISS `add`-after-
    * `train` shape with [[BqIndex.append]]'s delivery contract: the
    * delta is encoded under the STORED codebooks (and rotation) and
    * lands once per content token via [[StagedCommit.appendOnce]]. A
    * redelivered batch is a no-op; a killed-mid-rename commit is
    * invisible to [[committedCodes]]-based probes until the retry
    * completes it. Plain [[encode]] keeps its blind-append semantics
    * for single-shot rebuild flows; incremental production appends
    * belong here. The caller owns id-disjointness with existing codes
    * (same contract as encode). */
  def append(emb: DataFrame, idCol: String, vecCol: String,
             partitionBy: Option[String] = None): Boolean = {
    val done = new org.apache.hadoop.fs.Path(s"$codesPath/_SUCCESS")
    require(done.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(done), s"no complete PQ index at $basePath")
    val token = StagedCommit.idToken(emb, idCol, vecCol)
    StagedCommit.appendOnce(codesPath, token, partitionBy.toSeq,
      codeRows(emb, idCol, vecCol, storedCodebooks(), partitionBy))
  }

  /** Committed-only view of the codes table: base-build files plus
    * marker-committed [[append]] deltas — a probe racing a killed
    * append never sees its partial files. */
  def committedCodes(): DataFrame =
    StagedCommit.readCommitted(spark, codesPath)

  private def storedCodebooks(): Seq[Seq[(Int, Seq[Double])]] =
    codebook().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(t => (t._2, t._3)).toSeq)

  /** Stored rotation, if this index was built with `rotate = true`. */
  private def loadRotation(): Option[Array[Array[Long]]] = {
    val p = new org.apache.hadoop.fs.Path(rotationPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(rotationPath).collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).map(_._2))
  }

  /** The stored rotation as a column transform (identity when none):
    * per output dim, a deterministic sequential fold over the row —
    * only the build/encode pass pays this; probes rotate the QUERY
    * driver-side and read codes only. */
  private def rotated(vec: Column): Column = loadRotation() match {
    case None => vec
    case Some(rot) =>
      val rlit = array(rot.map(row =>
        array(row.map(v => lit(v / 1e6)): _*)): _*)
      transform(rlit, row =>
        aggregate(zip_with(row, vec, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x))
  }

  /** One distributed encode pass: explode the (rotated) vector into its
    * m subvectors, argmin each against the BROADCAST codeword table
    * (dist² = |c|² − 2·x·c up to the row-constant |x|²; min(struct)
    * ties break to the lower code), regroup to the m-byte code word.
    * Two k-bounded aggregations, zero codebook literals in the plan —
    * the literal-inlining formulation was a driver planning bomb at
    * realistic k. */
  private def encodeWith(emb: DataFrame, idCol: String, vecCol: String,
                         codebooks: Seq[Seq[(Int, Seq[Double])]],
                         partitionBy: Option[String],
                         mode: SaveMode): Unit = {
    val codeWords = codeRows(emb, idCol, vecCol, codebooks, partitionBy)
    partitionBy match {
      // cluster by the partition column first (same rationale as
      // IvfIndex.writeAssigned): without it every shuffle partition
      // fragments every cell dir, and the pruned ADC probe pays the
      // file-listing overhead on every search
      case Some(p) => codeWords.repartition(col(p))
        .write.mode(mode).partitionBy(p).parquet(codesPath)
      case None => codeWords.write.mode(mode).parquet(codesPath)
    }
  }

  /** Frozen-codebook DYNAMIC-OVERWRITE encode of a slice: replaces
    * exactly the partitions `emb` carries (dynamic partition
    * overwrite), leaving every other partition's files byte-untouched —
    * the surgical path for a caller that re-derives SOME partitions'
    * codes (IVFPQ after a parent recenter: residual geometry changed
    * only for the recentred cells). Not atomic on its own: the caller
    * owns the epoch/staleness protocol that keeps probes off the codes
    * until the refresh completes (IvfPq refuses on epoch mismatch
    * throughout). */
  def reencodePartitions(emb: DataFrame, idCol: String, vecCol: String,
                         partitionBy: String): Unit = {
    val rows = codeRows(emb, idCol, vecCol, storedCodebooks(),
        Some(partitionBy))
      .repartition(col(partitionBy)).localCheckpoint()
    // crash-safe rewrite (r18): write-ahead-intent swap of exactly the
    // re-encoded partitions' files — a kill mid-swap rolls forward
    // instead of losing cells (see StagedCommit.swapFiles)
    val dirs = {
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName
      rows.select(col(partitionBy).cast("string")).distinct().collect()
        .map(r => s"$partitionBy=${escapePathName(r.getString(0))}")
        .toSeq
    }
    StagedCommit.swapFiles(spark, codesPath, rows, Seq(partitionBy),
      dirs)
  }

  /** The encode pass as a DataFrame — shared by [[encodeWith]] (plain
    * write) and [[append]] (staged exactly-once commit). */
  private def codeRows(emb: DataFrame, idCol: String, vecCol: String,
                       codebooks: Seq[Seq[(Int, Seq[Double])]],
                       partitionBy: Option[String]): DataFrame = {
    import spark.implicits._
    val m = codebooks.length
    val subDim = codebooks.head.head._2.length
    val cdf = codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.map { case (code, cw) => (j, code, cw, cw.map(x => x * x).sum) }
    }.toDF("_j", "_code", "_cvec", "_cn2")
    val pb = partitionBy.toSeq
    val sub = emb.select(
        (col(idCol).as("_aid") +: pb.map(col)) :+
          rotated(col(vecCol).cast("array<double>")).as("_rv"): _*)
      .select(
        (col("_aid") +: pb.map(col)) :+
          posexplode(array((0 until m).map(j =>
            slice(col("_rv"), j * subDim + 1, subDim)): _*))
            .as(Seq("_j", "_sv")): _*)
    val perSub = sub.join(broadcast(cdf), "_j")
      .select(
        (col("_aid") +: col("_j") +: pb.map(col)) :+
          struct(
            (col("_cn2") - VectorFunctions.dot(col("_sv"), col("_cvec")) * 2)
              .as("dist"),
            col("_code").as("idx")).as("_s"): _*)
      .groupBy(col("_aid"), col("_j"))
      .agg(min(col("_s")).as("_best"),
        pb.map(c => first(col(c)).as(c)): _*)
    perSub
      .groupBy(col("_aid"))
      .agg(transform(
          array_sort(collect_list(struct(col("_j"),
            col("_best.idx").as("_code")))),
          s => s.getField("_code").cast("byte")).as("codes"),
        pb.map(c => first(col(c)).as(c)): _*)
      .select((col("_aid").as("id") +: col("codes") +: pb.map(col)): _*)
  }

  def codebook(): DataFrame = spark.read.parquet(codebookPath)
  def codes(): DataFrame = spark.read.parquet(codesPath)

  /** Compact code partitions fragmented by [[encode]] appends — the PQ
    * analog of [[IvfIndex.compact]] (see there for the
    * lineage-truncation and non-atomicity notes). Only meaningful for a
    * partitioned codes table (the IVFPQ composition); rewrites only
    * partitions holding more than `maxFiles` files, content-preserving
    * (derived-artifact epochs stay valid). Returns how many partitions
    * were rewritten. */
  def compact(partitionCol: String = "cell", maxFiles: Int = 1): Long = {
    // a prior compact may have died mid-swap: heal before enumerating
    // ([[codes]] is a plain directory read, not a committed read)
    StagedCommit.recoverSwapAt(spark, codesPath)
    val frag = codes()
      .select(col(partitionCol), input_file_name().as("_f"))
      .groupBy(col(partitionCol)).agg(countDistinct(col("_f")).as("_nf"))
      .filter(col("_nf") > maxFiles)
      .select(col(partitionCol))
      .localCheckpoint()
    val n = frag.count()
    if (n > 0) {
      val compacted = codes()
        .join(broadcast(frag), Seq(partitionCol), "left_semi")
        .repartition(col(partitionCol))
        .localCheckpoint()
      // crash-safe rewrite (r18): write-ahead-intent swap of exactly
      // the fragmented partitions' files — see StagedCommit.swapFiles
      val dirs = {
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName
        frag.select(col(partitionCol).cast("string")).distinct()
          .collect()
          .map(r => s"$partitionCol=${escapePathName(r.getString(0))}")
          .toSeq
      }
      StagedCommit.swapFiles(spark, codesPath, compacted,
        Seq(partitionCol), dirs)
    }
    n
  }

  /** ADC approximate-score column for `query` over a `codes` column,
    * from the stored artifacts. The query is first rotated if this
    * index stores a rotation — exact fixed-point arithmetic
    * ([[Opq.apply]]), so any engine derives the identical rotated
    * query. LUT: per (subspace, code) the query-subvector · codeword
    * dot, rounded to 6 dp so the stored-codebook replay is
    * engine-portable; the ADC total is re-rounded to 6 dp — it is
    * mathematically a sum of 6-dp multiples, so rounding erases float
    * addition-order noise and any engine summing the same table hits
    * ranks candidates identically. */
  def adcScore(query: Seq[Double]): Column = {
    val cb = codebook().collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2)))
      .toMap
    val m = cb.keys.map(_._1).max + 1
    val nCodes = cb.keys.map(_._2).max + 1
    val storedSubDim = cb.head._2.length
    require(query.length == m * storedSubDim,
      s"query dim ${query.length} does not match the indexed dim " +
        s"${m * storedSubDim} ($m subspaces x $storedSubDim) — a mismatched " +
        "query would silently misalign every LUT slice")
    val q = loadRotation() match {
      case Some(rot) => Opq.apply(rot, query.toArray).toSeq
      case None => query
    }
    val subDim = q.length / m
    val lut: Array[Array[Double]] = Array.tabulate(m, nCodes) { (j, c) =>
      val cw = cb((j, c))
      val qs = q.slice(j * subDim, (j + 1) * subDim)
      BigDecimal(qs.zip(cw).map { case (a, b) => a * b }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    round((0 until m).map { j =>
      element_at(array(lut(j).map(lit): _*),
        element_at(col("codes"), j + 1).cast("int") + 1)
    }.reduce(_ + _), 6)
  }

  /** ADC search: approximate score from the codes column and the
    * driver-built lookup table; exact cosine re-rank of the top
    * `rerank` rows against the float corpus. `emb` must be the corpus
    * the index was built over (the codes table carries no vectors —
    * that is the point). */
  def search(emb: DataFrame, idCol: String, vecCol: String,
             query: Seq[Double], k: Int, rerank: Int): DataFrame =
    searchOver(codes(), emb, idCol, vecCol, query, k, rerank)

  /** [[search]] over the COMMITTED codes view — the probe form for an
    * [[append]]-maintained index: candidates come only from base files
    * plus marker-committed deltas, so a probe racing a killed-then-
    * retried append never ranks a partial delta's rows. */
  def searchCommitted(emb: DataFrame, idCol: String, vecCol: String,
                      query: Seq[Double], k: Int, rerank: Int): DataFrame =
    searchOver(committedCodes(), emb, idCol, vecCol, query, k, rerank)

  private def searchOver(codesDf: DataFrame, emb: DataFrame, idCol: String,
                         vecCol: String, query: Seq[Double], k: Int,
                         rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val cand = codesDf
      .select(col("id"), adcScore(query).as("_adc"))
      .orderBy(col("_adc").desc, col("id").asc)
      .limit(rerank)
      .select(col("id").as(idCol))
    val q = array(query.map(lit): _*)
    emb.join(broadcast(cand), idCol)
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q)
          .as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
