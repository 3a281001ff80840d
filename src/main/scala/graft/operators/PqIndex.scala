package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent product-quantization index (the FAISS PQ shape): vectors
  * compressed to one code per subspace, searched with asymmetric
  * distance computation (ADC).
  *
  * Build: split each `dim` vector into `m` subvectors of dim/m; run an
  * independent Lloyd k-means (k codewords, same broadcast-argmin device
  * as [[IvfIndex]]) in every subspace; store
  *
  *   `<base>/pq_codebook` — m·k codeword rows (subspace, code, centroid);
  *   `<base>/pq_codes`    — per corpus row the m-byte code word
  *                          (`array<tinyint>`): dim×4 bytes → m bytes,
  *                          a 32× compression at dim=64/m=8.
  *
  * Search (ADC): the query is NOT quantized — per subspace, its dot
  * product against all k codewords forms a lookup table (m·k doubles,
  * driver-side, rounded to 6 dp so any engine reproduces the entries
  * from the stored codebook); a row's approximate score is the sum of
  * its m table hits, a flat codegen'd expression over the codes column.
  * The scan reads ONLY the m-byte codes; the float column is touched
  * just for the `rerank` survivors, re-ranked at full precision.
  *
  * The codebook is trained data, so determinism of SEARCH never depends
  * on k-means internals: the oracle replays ADC + re-rank from the
  * stored artifacts exactly as probes do.
  */
final class PqIndex(spark: SparkSession, basePath: String) {

  private def codebookPath = s"$basePath/pq_codebook"
  private def codesPath = s"$basePath/pq_codes"

  private def subvec(vec: Column, j: Int, subDim: Int): Column =
    slice(vec.cast("array<double>"), j * subDim + 1, subDim)

  /** Argmin-assignment of one subspace against its codeword table —
    * same broadcast + min(struct) device as [[IvfIndex.assignments]]
    * (dist² = |c|² − 2·x·c up to the row-constant |x|²). */
  private def assignCodes(sub: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    val cdf = cents.map { case (i, c) => (i, c, c.map(x => x * x).sum) }
      .toDF("_code", "_cvec", "_cn2")
    sub.crossJoin(broadcast(cdf))
      .select(col("_aid"), col("_sv"),
        struct(
          (col("_cn2") - VectorFunctions.dot(col("_sv"), col("_cvec")) * 2)
            .as("dist"),
          col("_code").as("idx")).as("_s"))
      .groupBy(col("_aid"))
      .agg(min(col("_s")).as("_best"), first(col("_sv")).as("_sv"))
      .select(col("_aid"), col("_best.idx").as("_code"), col("_sv"))
  }

  /** Train the m codebooks and encode the corpus. `partitionBy` writes
    * the codes table partitioned by an input column (e.g. an IVF cell
    * id) so a pruned probe reads only its partition's codes. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, k: Int = 16, iters: Int = 4,
            partitionBy: Option[String] = None): Unit = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim ($dim) must divide into m ($m) subspaces")
    // codes are stored as signed bytes: codewords above 127 would wrap
    // negative and corrupt ADC's 1-based LUT indexing silently
    require(k >= 1 && k <= 128, s"codewords per subspace must be in [1,128]: $k")
    val subDim = dim / m
    val src = emb.select(col(idCol).as("_aid"),
        col(vecCol).cast("array<double>").as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val perSubspace = (0 until m).map { j =>
      val sub = src.select(col("_aid"), subvec(col("_v"), j, subDim).as("_sv"))
      // deterministic seeded init: k hash-smallest subvectors
      var cents: Seq[(Int, Seq[Double])] = sub
        .withColumn("_h", xxhash64(col("_sv")))
        .orderBy(col("_h")).limit(k)
        .select("_sv").collect()
        .map(_.getSeq[Double](0).toSeq).zipWithIndex.map(_.swap).toSeq
      for (_ <- 1 to iters) {
        val means = assignCodes(sub, cents)
          .select(col("_code"), posexplode(col("_sv")).as(Seq("_pos", "_x")))
          .groupBy(col("_code"), col("_pos")).agg(avg(col("_x")).as("_m"))
          .collect()
        val byIdx = means.groupBy(_.getInt(0)).map { case (code, rows) =>
          code -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
        cents = cents.map { case (i, c) => (i, byIdx.getOrElse(i, c)) }
      }
      val codes = assignCodes(sub, cents)
        .select(col("_aid"), lit(j).as("_j"), col("_code"))
      (cents, codes)
    }

    import spark.implicits._
    perSubspace.zipWithIndex.flatMap { case ((cents, _), j) =>
      cents.map { case (code, c) => (j, code, c) }
    }.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(codebookPath)

    // one m-byte code word per row, subspace-ordered
    val codeWords = perSubspace.map(_._2).reduce(_ union _)
      .groupBy(col("_aid"))
      .agg(transform(
        array_sort(collect_list(struct(col("_j"), col("_code")))),
        s => s.getField("_code").cast("byte")).as("codes"))
    partitionBy match {
      case Some(p) =>
        codeWords
          .join(emb.select(col(idCol).as("_aid"), col(p)), "_aid")
          .select(col("_aid").as("id"), col("codes"), col(p))
          .write.mode(SaveMode.Overwrite).partitionBy(p).parquet(codesPath)
      case None =>
        codeWords.select(col("_aid").as("id"), col("codes"))
          .write.mode(SaveMode.Overwrite).parquet(codesPath)
    }
    src.unpersist()
  }

  def codebook(): DataFrame = spark.read.parquet(codebookPath)
  def codes(): DataFrame = spark.read.parquet(codesPath)

  /** ADC search: approximate score from the codes column and the
    * driver-built lookup table; exact cosine re-rank of the top
    * `rerank` rows against the float corpus. `emb` must be the corpus
    * the index was built over (the codes table carries no vectors —
    * that is the point). */
  /** ADC approximate-score column for `query` over a `codes` column,
    * from the stored codebook. LUT: per (subspace, code) the
    * query-subvector · codeword dot, rounded to 6 dp so the
    * stored-codebook replay is engine-portable; the ADC total is
    * re-rounded to 6 dp — it is mathematically a sum of 6-dp multiples,
    * so rounding erases float addition-order noise and any engine
    * summing the same table hits ranks candidates identically. */
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
    val subDim = query.length / m
    val lut: Array[Array[Double]] = Array.tabulate(m, nCodes) { (j, c) =>
      val cw = cb((j, c))
      val qs = query.slice(j * subDim, (j + 1) * subDim)
      BigDecimal(qs.zip(cw).map { case (a, b) => a * b }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    round((0 until m).map { j =>
      element_at(array(lut(j).map(lit): _*),
        element_at(col("codes"), j + 1).cast("int") + 1)
    }.reduce(_ + _), 6)
  }

  def search(emb: DataFrame, idCol: String, vecCol: String,
             query: Seq[Double], k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val cand = codes()
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
