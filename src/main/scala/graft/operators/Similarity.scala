package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), BASELINE north-star operator.
  *
  *  - `bruteForceTopK`: exact baseline. Score is computed per-partition in
  *    codegen'd higher-order functions; top-k selection is Spark's
  *    distributed TakeOrdered (per-partition heaps → driver merge of k
  *    rows), NOT a global sort — scales linearly with corpus size.
  *  - `ivfTopK`: IVF-style scale path — probe only the `nprobe` cells whose
  *    centroid is closest to the query; within-cell scan is pruned by a
  *    partition-friendly cell filter.
  *  - `lshBuckets`/`lshTopK`: random-hyperplane (sign) LSH — deterministic
  *    planes from a fixed seed; candidates share the query's bucket in ≥1
  *    of `numTables` tables.
  */
object Similarity {

  /** Exact top-k by cosine against a constant query vector. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    emb.select(col(idCol),
        cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Radius (range) search: ALL corpus vectors with rounded cosine ≥
    * `minScore` against the query — the shape for "every near-duplicate
    * of this vector", where k is unknowable in advance. A pure
    * scan-stage predicate: the query ships as an array literal, the
    * cosine evaluates inside the scan's codegen stage, and output is
    * ∝ matches — no top-k heap, no shuffle, the same plan at any
    * corpus size. Pair with an IVF/LSH pre-prune (probe the pruned
    * partitions, then this predicate) when the corpus scan itself is
    * the bottleneck. */
  def rangeSearch(emb: DataFrame, idCol: String, vecCol: String,
                  query: Seq[Double], minScore: Double): DataFrame = {
    val q = array(query.map(lit): _*)
    emb.select(col(idCol),
        cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .filter(col("score") >= minScore)
  }

  /** Per-cell centroids (mean vector per value of `cellCol`) — the "coarse
    * quantizer" an IVF index needs. posexplode → per-(cell,dim) avg (fully
    * map-side-combinable, no big rows) → re-assemble ordered by position. */
  def centroids(emb: DataFrame, cellCol: String, vecCol: String): DataFrame =
    emb.select(col(cellCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_pos", "_x")))
      .groupBy(col(cellCol), col("_pos")).agg(avg(col("_x")).as("_m"))
      .groupBy(col(cellCol))
      .agg(transform(
        array_sort(collect_list(struct(col("_pos"), col("_m")))),
        s => s.getField("_m")).as("centroid"))

  /** IVF search: rank cells by centroid-to-query cosine, keep the best
    * `nprobe`, brute-force only inside those cells. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, cellCol: String,
              query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val cents = centroids(emb, cellCol, vecCol)
      .select(col(cellCol), cosine(col("centroid"), q).as("_cscore"))
      .orderBy(col("_cscore").desc, col(cellCol).asc)
      .limit(nprobe)
      .select(col(cellCol))
    emb.join(broadcast(cents), cellCol)
      .select(col(idCol),
        cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic random hyperplanes: `numTables × bitsPerTable` planes of
    * dimension `dim`, seeded — both sides of a comparison regenerate the
    * identical planes. */
  def hyperplanes(dim: Int, numTables: Int, bitsPerTable: Int,
                  seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new Random(seed)
    Array.fill(numTables, bitsPerTable, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH bucket id for one table: bit b set iff dot(vec, plane_b)>0. */
  private def bucketId(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(dot(vec, array(p.map(lit): _*)) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))

  /** Attach `numTables` LSH bucket columns (`_lsh0`.. ) to the frame. */
  def lshBuckets(emb: DataFrame, vecCol: String,
                 planes: Array[Array[Array[Double]]]): DataFrame =
    planes.zipWithIndex.foldLeft(emb) { case (df, (tbl, i)) =>
      df.withColumn(s"_lsh$i",
        bucketId(col(vecCol).cast("array<double>"), tbl))
    }

  /** Per-table sign-LSH bucket of a query vector, computed driver-side
    * with the same per-plane dot + bit fold the column-side bucketing
    * performs — the ONE implementation both the scan path and the
    * persistent [[LshIndex]] use, so they cannot diverge. */
  def queryBuckets(planes: Array[Array[Array[Double]]],
                   query: Seq[Double]): Seq[Long] =
    probeBuckets(planes, query, probes = 1).map(_.head)

  /** Multiprobe bucket sets (Lv et al., "Multi-Probe LSH", VLDB 2007):
    * per table, the query's exact bucket plus the buckets reached by
    * the `probes-1` PERTURBATION SETS — subsets of sign bits flipped
    * together — of smallest total margin, where a bit's margin |q·p| is
    * how close the query sat to that hyperplane. A set's score is the
    * SUM of its members' margins (Lv et al. §4.1: the query-directed
    * probing order), so the sequence naturally interleaves: a pair of
    * near-zero margins outranks one large single-bit flip. Sets are
    * bounded to ≤ 2 bits — the regime multiprobe actually operates in
    * (a 3-bit flip's score is almost never competitive; Lv et al.'s
    * own evaluation uses small sets) — and the bound is REFUSED loudly
    * past its reach (1 + bits + C(bits,2) buckets per table), never
    * silently truncated.
    *
    * Engine-portable total order: margins round to 6 dp BEFORE
    * summation (so an external engine summing in any order re-derives
    * identical scores), ties break by the flip mask's numeric value —
    * which also pins the degenerate case: a zero-margin pair ties its
    * zero-margin singletons and loses to them on mask, keeping the
    * probes=2 prefix exactly the single-smallest-margin flip. */
  def probeBuckets(planes: Array[Array[Array[Double]]],
                   query: Seq[Double], probes: Int): Seq[Seq[Long]] = {
    require(probes >= 1, s"probes must be >= 1: $probes")
    val bits = planes.head.length
    val reach = 1 + bits + bits * (bits - 1) / 2
    require(probes <= reach,
      s"probes ($probes) exceeds the ≤2-bit perturbation reach " +
        s"($reach = 1 + $bits + C($bits,2)) — larger sets are not implemented")
    planes.toSeq.map { tbl =>
      val dots = tbl.zipWithIndex.map { case (p, b) =>
        (p.zip(query).map { case (x, y) => x * y }.sum, b)
      }
      val exact = dots.map { case (d, b) => if (d > 0) 1L << b else 0L }
        .foldLeft(0L)(_ | _)
      val margin = dots.map { case (d, _) =>
        BigDecimal(math.abs(d))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val singles = (0 until bits).map(i => (margin(i), 1L << i))
      val pairs = for {
        i <- 0 until bits; j <- (i + 1) until bits
      } yield (margin(i) + margin(j), (1L << i) | (1L << j))
      val flips = (singles ++ pairs)
        .sortBy { case (score, mask) => (score, mask) }
        .take(probes - 1)
        .map { case (_, mask) => exact ^ mask }
      exact +: flips.toSeq
    }
  }

  /** LSH ANN top-k: candidates = rows sharing the query's bucket in any
    * table; exact cosine re-rank of candidates only. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int,
              planes: Array[Array[Array[Double]]],
              probes: Int = 1): DataFrame = {
    val q = array(query.map(lit): _*)
    val qBuckets = probeBuckets(planes, query, probes)
    val withBuckets = lshBuckets(emb, vecCol, planes)
    val cond = qBuckets.zipWithIndex
      .map { case (qbs, i) => col(s"_lsh$i").isin(qbs: _*) }
      .reduce(_ || _)
    withBuckets.filter(cond)
      .select(col(idCol),
        cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Largest absolute embedding component in the corpus — the scalar a
    * symmetric int8 quantizer needs. Driver-side scalar by design (one
    * fully map-side-combinable max aggregate → one row). */
  def sqMaxAbs(emb: DataFrame, vecCol: String): Double =
    emb.select(max(array_max(transform(
        col(vecCol).cast("array<double>"), x => abs(x)))).as("m"))
      .head().getDouble(0)

  /** Symmetric int8 quantization of a vector: round(x · 127/maxAbs),
    * every component in [-127, 127]. Ties round away from zero (Spark
    * ROUND = HALF_UP), matching DuckDB/standard SQL `round`. */
  def sqQuantize(vec: Column, maxAbs: Double): Column = {
    require(maxAbs > 0, s"maxAbs must be positive: $maxAbs")
    transform(vec.cast("array<double>"),
      x => round(x * lit(127.0 / maxAbs), 0).cast("int"))
  }

  /** Scalar-quantized ANN top-k: rank the corpus by the INT8 dot product
    * (exact integer arithmetic — products sum to ≪2⁵³, so the double
    * codegen path is bit-exact), keep the best `rerank` candidates, then
    * re-rank those by full-precision cosine.
    *
    * The 100 TB story is the candidate stage's IO: int8 vectors are 4×
    * smaller than float32, so the first-pass scan reads a quarter of the
    * bytes (store the quantized column alongside the corpus and the
    * full-precision pass touches only `rerank` rows). Both stages are
    * distributed TakeOrdered (per-partition heaps, driver merge of
    * `rerank` resp. `k` rows) — no global sort, no shuffle.
    *
    * Deterministic end-to-end: the quantizer scale and both tie-breaks
    * ((qdot desc, id asc), then (score desc, id asc)) are total orders,
    * so an oracle replaying the same two-stage pipeline hash-matches. */
  def sqTopK(emb: DataFrame, idCol: String, vecCol: String,
             query: Seq[Double], k: Int, rerank: Int,
             maxAbs: Double): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val qq = sqQuantize(array(query.map(lit): _*), maxAbs)
    val cand = emb.select(col(idCol), col(vecCol),
        dot(sqQuantize(col(vecCol), maxAbs), qq).as("_qdot"))
      .orderBy(col("_qdot").desc, col(idCol).asc)
      .limit(rerank)
    val q = array(query.map(lit): _*)
    cand.select(col(idCol),
        cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-dimension means of `vecCol`, rounded to 6 dp — the centering
    * thresholds for [[bqTopK]]'s sign bits. Rounded BEFORE use so an
    * external oracle recomputing the mean in a different summation
    * order lands on the identical threshold: raw double averages
    * differ across engines in the last ulp, and a vector component
    * sitting on that ulp would flip its bit. */
  def bqMeans(emb: DataFrame, vecCol: String): Seq[Double] =
    emb.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("_i", "_x")))
      .groupBy(col("_i")).agg(round(avg(col("_x")), 6).as("_m"))
      .orderBy(col("_i"))
      .collect().map(_.getDouble(1)).toSeq

  /** Mean-centered sign bits of a vector packed into `ceil(d/64)`
    * longs — the binary-quantization code word. */
  private[operators] def bqWordsExpr(vecCol: String,
                                     means: Seq[Double]): String = {
    val d = means.length
    val nwords = (d + 63) / 64
    val meansSql = means.map(m => s"CAST($m AS DOUBLE)")
      .mkString("array(", ",", ")")
    s"""transform(sequence(0, ${nwords - 1}), w ->
        aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, b) ->
          CASE WHEN w * 64 + b < $d AND
            element_at(CAST(`$vecCol` AS array<double>), w * 64 + b + 1) >
              element_at($meansSql, w * 64 + b + 1)
          THEN acc | shiftleft(CAST(1 AS BIGINT), b) ELSE acc END))"""
  }

  /** Binary-quantized ANN top-k ("BQ" — 1 bit per dimension): rank the
    * corpus by Hamming distance between mean-centered sign-bit code
    * words (packed longs, XOR + popcount per 64 dims), keep the best
    * `rerank` candidates, re-rank those by full-precision cosine.
    *
    * The 100 TB story is even stronger than [[sqTopK]]'s int8: the
    * code word is 32× smaller than float32, so a corpus whose vectors
    * occupy 25 TB scans 0.8 TB of codes in the candidate pass (store
    * the code column alongside the corpus — here it is computed
    * in-plan), and the per-row cost is d/64 XOR+popcount ops instead
    * of d multiplies. Candidate quality follows the random-projection
    * sign argument (the same guarantee LSH hyperplanes give, with the
    * data's own axes as planes); `rerank` buys back the quantization
    * loss exactly like sqTopK's second stage.
    *
    * Both stages are distributed TakeOrdered (per-partition heaps,
    * driver merge) — no shuffle, no global sort. Deterministic: the
    * 6-dp means are a fixed threshold, strict `>` on both sides, and
    * both tie-breaks ((hamming asc, id asc), (score desc, id asc)) are
    * total orders — an oracle replaying sign-mismatch counts over the
    * same rounded means hash-matches without reproducing the packing. */
  /** The query's packed sign-bit code under `means` — driver-side twin
    * of [[bqWordsExpr]] (same bit layout, bit b of word w = dimension
    * w·64+b strictly above its mean). */
  private[operators] def bqQueryWords(query: Seq[Double],
                                      means: Seq[Double]): Seq[Long] = {
    val d = means.length
    (0 until (d + 63) / 64).map { w =>
      (0 until 64).foldLeft(0L) { (acc, b) =>
        val i = w * 64 + b
        if (i < d && query(i) > means(i)) acc | (1L << b) else acc
      }
    }
  }

  /** SQL expr: Hamming distance between the `_bqw` column and the
    * query's code words (XOR + popcount per 64-dim word). */
  private[operators] def bqHammingExpr(qWords: Seq[Long]): String = {
    val qwSql = qWords.map(w => s"${w}L").mkString("array(", ",", ")")
    s"""aggregate(zip_with(_bqw, $qwSql, (a, b) -> bit_count(a ^ b)),
        0, (acc, x) -> acc + x)"""
  }

  def bqTopK(emb: DataFrame, idCol: String, vecCol: String,
             query: Seq[Double], k: Int, rerank: Int,
             means: Seq[Double]): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    require(means.nonEmpty, "means must not be empty")
    val qWords = bqQueryWords(query, means)
    val hamExpr = bqHammingExpr(qWords)
    val cand = emb
      .withColumn("_bqw", expr(bqWordsExpr(vecCol, means)))
      .withColumn("_ham", expr(hamExpr))
      .orderBy(col("_ham").asc, col(idCol).asc)
      .limit(rerank)
    val q = array(query.map(lit): _*)
    cand.select(col(idCol),
        cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Matryoshka (truncated-prefix) ANN top-k: rank the corpus by cosine
    * over only the FIRST `prefixDims` components, keep the best
    * `rerank` candidates, re-rank those by full-dimension cosine.
    *
    * The premise is the embedding's, not the engine's: matryoshka-
    * trained representations (MRL, Kusupati et al. 2022) pack a usable
    * coarse embedding into every prefix, so the candidate pass reads
    * `prefixDims/d` of the vector bytes (store the prefix as its own
    * column/file at scale — d/4 dims ⇒ 4× less candidate IO, the same
    * lever as [[sqTopK]]'s int8 and [[bqTopK]]'s bits, traded along the
    * dimension axis instead of the precision axis). Both stages are
    * distributed TakeOrdered; the 6-dp-rounded prefix score with the
    * id tie-break is a total order an external oracle replays. */
  def mrlTopK(emb: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, rerank: Int,
              prefixDims: Int): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    require(prefixDims >= 1 && prefixDims <= query.length,
      s"prefixDims ($prefixDims) must be in [1, ${query.length}]")
    val qPref = array(query.take(prefixDims).map(lit): _*)
    // a vector whose PREFIX is all zeros has no cosine against the
    // query prefix (0/0 under ANSI is an error, not a ranking) — rank
    // it last deterministically; the full-dim rerank never divides by
    // zero on real unit-norm embeddings
    val pref = slice(col(vecCol).cast("array<double>"), 1, prefixDims)
    val cand = emb.select(col(idCol), col(vecCol),
        when(dot(pref, pref) === 0.0, lit(-2.0))
          .otherwise(cosineRounded(pref, qPref)).as("_ps"))
      .orderBy(col("_ps").desc, col(idCol).asc)
      .limit(rerank)
    val q = array(query.map(lit): _*)
    cand.select(col(idCol),
        cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Top-k neighbors per anchor within blocks (kNN-join building block).
    *
    * Candidate-bounded formulation — two scale devices over the naive
    * "block self-join + window rank" (which materializes and SORTS the
    * full within-block pair product, quadratic on a hot block):
    *
    *  1. Triangle sub-bucket decomposition (same device as
    *     [[Dedup.embeddingNearDupPairs]]): each row gets a content-hash
    *     sub-bucket in [0,B); the pair space splits into B(B+1)/2
    *     bucket-pair join tasks per block, so one dominant block (a
    *     corpus-scale language/label) spreads over ~B²/2 tasks instead of
    *     landing on a single join task. Each unordered pair meets exactly
    *     once; since kNN is directed, the meeting emits BOTH directions
    *     map-side (explode of 2 structs — no second join pass).
    *  2. Per-anchor ranking through [[GroupTopK.topKPerGroup]], a
    *     k-bounded typed aggregator: partial aggregation truncates to k
    *     entries per (task, anchor) BEFORE the shuffle, so the exchange
    *     carries at most k rows' state per anchor per map task and no
    *     sort of the pair product ever happens — work per task is the
    *     bucket-pair product, but shuffle + memory are k-bounded.
    *
    * Score ties at 6 dp break to the SMALLER neighbor id (the aggregator
    * orders (score, id) descending, so the partner id is negated on the
    * way in and restored on the way out).
    *
    * `idCol` MUST be an integral column (byte/short/int/long): the
    * k-bounded aggregator ranks ids through a signed-long negation trick,
    * so string/UUID keys are not supported — map them to a dense surrogate
    * id first (see [[Ids]]). Enforced eagerly below so misuse fails with a
    * clear message instead of an ANSI cast error (or silent null anchors
    * with ANSI off) deep inside the aggregation. */
  /** `maxScore` excludes the near-duplicate band BEFORE ranking
    * (strictly `score < maxScore`): with the default no pair is
    * excluded; with a duplicate threshold the result is each anchor's
    * k most-similar NON-duplicates — contrastive-training hard
    * negatives. The filter must sit below the aggregator, not above
    * it: filtering a top-k ranking afterwards loses exactly the
    * anchors whose top k was all duplicates. */
  def blockKnn(emb: DataFrame, idCol: String, vecCol: String,
               blockCol: String, k: Int, subBuckets: Int = 8,
               maxScore: Double = Double.MaxValue): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = emb.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"blockKnn requires an integral id column; '$idCol' is $idType — " +
        "assign a dense numeric surrogate id (graft.operators.Ids) first")
    val B = math.max(subBuckets, 1)
    val bucket = pmod(xxhash64(col(idCol)), lit(B.toLong))
    // per-row norms below the join (see Dedup.embeddingNearDupPairs)
    val a = emb.select(col(blockCol).as("_blk"), col(idCol).as("id_a"),
        col(vecCol).as("_va"), norm(col(vecCol)).as("_na"), bucket.as("_ba"))
      .withColumn("_bb", explode(sequence(col("_ba"), lit(B.toLong - 1))))
    val b = emb.select(col(blockCol).as("_blk"), col(idCol).as("id_b"),
        col(vecCol).as("_vb"), norm(col(vecCol)).as("_nb"), bucket.as("_bb2"))
      .withColumn("_ba", explode(sequence(lit(0L), col("_bb2"))))
      .withColumnRenamed("_bb2", "_bb")
    val directed = a.join(b, Seq("_blk", "_ba", "_bb"))
      // same-bucket pairs meet once via id order; cross-bucket pairs meet
      // once by construction (left replicates up, right replicates down)
      .filter(col("_ba") < col("_bb") || col("id_a") < col("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      // cosine is undefined for a zero-norm vector: such pairs are
      // dropped rather than scored NULL (the aggregator's (Double, Long)
      // encoder is non-nullable, and "unrankable" is the right semantics)
      .filter(col("_na") * col("_nb") > 0)
      .withColumn("score",
        round(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 6))
      .filter(col("score") < maxScore)
      .select(explode(array(
        struct(col("id_a").cast("long").as("anchor"),
          (-col("id_b").cast("long")).as("_negid"), col("score")),
        struct(col("id_b").cast("long").as("anchor"),
          (-col("id_a").cast("long")).as("_negid"), col("score")))).as("_d"))
      .select(col("_d.anchor"), col("_d._negid"), col("_d.score"))
    GroupTopK.topKPerGroup(directed, Seq("anchor"), "score", "_negid", k)
      .select(col("anchor").as("id_a"), (-col("_negid")).as("id_b"),
        col("score"))
  }

  /** Per-dimension mean/std over an embedding column — the feature-prep
    * profile run before quantizer or k-means training (PQ subspace
    * balance, SQ scale choice, standardization decisions). One
    * combinable aggregation; components are 1e-6-quantized to integers
    * first ([[IvfIndex.drift]]'s device), all moment arithmetic stays
    * EXACT integer/decimal up to one final well-defined decimal→double
    * conversion, so mean and std are bit-identical on any engine or
    * partition order: std = √(n·Σx² − (Σx)²) / (n·10⁶). DECIMAL(38,0)
    * sums — the long path would overflow Σx² near ~10⁵ rows × unit
    * scale. Output (dim, n, mean, std), dims 1-based. */
  def dimStats(emb: DataFrame, vecCol: String): DataFrame = {
    val e = emb
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("_d0", "_x")))
      .select((col("_d0") + 1).as("dim"),
        round(col("_x") * 1e6).cast("decimal(38,0)").as("_xm"))
    e.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("_xm")).as("_s"),
        sum(col("_xm") * col("_xm")).as("_ss"))
      .select(col("dim"), col("n"),
        round(col("_s").cast("double") / (col("n") * lit(1e6)), 6)
          .as("mean"),
        round(sqrt((col("_ss") * col("n") - col("_s") * col("_s"))
            .cast("double")) / (col("n") * lit(1e6)), 6)
          .as("std"))
  }
}
