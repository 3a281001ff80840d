package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed n-gram importance weighting for data selection — the DSIR
  * shape (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"), unigram instantiation.
  *
  * The question a 100 TB pretraining pipeline actually asks: "score
  * every raw document by how much it looks like the high-quality
  * target corpus, so the mixture can over-sample the good tail."
  * DSIR answers with a bag-of-hashed-ngrams likelihood ratio:
  *
  *   - tokens hash into B buckets (md5 mod B — the engine-portable
  *     hash the samplers already use);
  *   - target and raw bucket distributions p, q are add-one-smoothed
  *     unigram models fitted by two B-bounded aggregations;
  *   - a document's log importance weight is Σ_tokens ln(p_b/q_b).
  *
  * Determinism across engines: the per-bucket log-ratio is rounded to
  * 6 dp and stored as INTEGER MICRO-NATS (×10⁶, BIGINT) — the repo's
  * fixed-point idiom — so document scores are exact integer sums (far
  * below 2⁵³) and hash-match any engine that replays the B-row weight
  * table. The only doubles in the pipeline live in the B-row table
  * build, the same bounded surface as [[Sampling.weightedSample]]'s
  * 6-dp clocks.
  *
  * Scale shape: fitting is two map-side-combinable aggregations whose
  * output is B rows regardless of corpus size; scoring joins the
  * token stream to the BROADCAST B-row weight table in the scan stage
  * and ends in ONE per-document sum shuffle. Nothing corpus-sized is
  * ever collected, sorted, or windowed.
  *
  * Reference context: the reference has no content-quality scoring
  * (its only row filter is the validity predicate,
  * `2.1 leader-lambda-for-mysql.py:214-231` — our P3); this is part
  * of the LLM-pipeline extension surface next to the quality filters
  * in [[TextFunctions]] and the samplers in [[Sampling]].
  */
object Importance {

  /** Bucket id of a token: md5₃₂(token) mod `b`. */
  def bucket(token: Column, b: Int): Column =
    pmod(conv(substring(md5(token.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(b.toLong))

  /** One row per token instance: (`idCol`, `_bkt`). Whitespace
    * tokenization (single space), empties dropped — the same contract
    * as [[TextFunctions.tokenCount]]'s whitespace mode. */
  def tokenBuckets(df: DataFrame, idCol: String, textCol: String,
                   b: Int): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col(idCol), bucket(col("_t"), b).as("_bkt"))

  /** Fit the B-row weight table: (`_bkt`, `lam_micro`) for every
    * bucket in [0, b), where `lam_micro` = round(ln(p/q), 6)·10⁶ as
    * BIGINT, p = (target_count+1)/(target_total+b) and q the same
    * over the whole corpus. `isTarget` marks the target slice (it is
    * evaluated against `corpus`'s columns). Buckets no token hashed
    * into still get the smoothed ratio — absence is evidence.
    *
    * Fitting is EAGER, the FAISS/[[KMeans]] train-vs-encode split: one
    * tokenize pass aggregates to ≤b (bucket, target_count, raw_count)
    * rows, those land on the driver, and the returned weight table is
    * a LOCAL b-row DataFrame with no lineage into the corpus — so
    * scoring re-evaluates nothing, nothing needs persisting, and the
    * broadcast ships a literal table. (A lazy formulation tokenized
    * the corpus twice: once under the totals aggregate, once under the
    * per-bucket counts.) The micro-nat quantization runs in BigDecimal
    * HALF_UP — the repo's rounding idiom (`Opq.apply`) — so the stored
    * weights are the exact 6-dp decimals any engine reproduces. */
  def bucketLogRatios(corpus: DataFrame, textCol: String,
                      isTarget: Column, b: Int): DataFrame = {
    require(b >= 2 && b <= (1 << 20),
      s"bucket count must be in [2, 2^20] (the table is collected and " +
        s"broadcast): $b")
    val spark = corpus.sparkSession
    // one pass, two conditional counts; output is ≤b rows
    val counts = corpus
      .select(isTarget.as("_tgt"),
        explode(split(col(textCol), " ")).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col("_tgt"), bucket(col("_t"), b).as("_bkt"))
      .groupBy("_bkt").agg(
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"),
        count(lit(1)).as("_cr"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tt = counts.valuesIterator.map(_._1).sum.toDouble
    val rt = counts.valuesIterator.map(_._2).sum.toDouble
    val lam = (0L until b.toLong).map { k =>
      val (ct, cr) = counts.getOrElse(k, (0L, 0L))
      val ratio = ((ct + 1.0d) / (tt + b.toDouble)) /
        ((cr + 1.0d) / (rt + b.toDouble))
      val micro = BigDecimal(math.log(ratio))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000)
      (k, micro.toLongExact)
    }
    import spark.implicits._
    lam.toDF("_bkt", "lam_micro")
  }

  /** Per-document importance score in micro-nats: Σ over the doc's
    * token instances of the bucket's `lam_micro`. Documents with no
    * tokens score 0. Output: (`idCol`, `score_micro` BIGINT).
    *
    * Shape: token stream → broadcast-joined weight lookup in the scan
    * stage, UNIONed with a zero seed row per document (so token-less
    * documents surface without a corpus-sized join-back — the seed leg
    * scans only the id column), then ONE map-side-combinable per-doc
    * sum. The corpus is never shuffled except as (id, partial-sum)
    * aggregation state. */
  def score(corpus: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, b: Int): DataFrame =
    tokenBuckets(corpus, idCol, textCol, b)
      .join(broadcast(weights), Seq("_bkt"))
      .select(col(idCol), col("lam_micro"))
      .unionByName(corpus.select(col(idCol), lit(0L).as("lam_micro")))
      .groupBy(col(idCol))
      .agg(sum("lam_micro").as("score_micro"))

  /** The end-to-end convenience: fit on `corpus` against `isTarget`,
    * score every document. */
  def dsirScores(corpus: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, b: Int): DataFrame =
    score(corpus, idCol, textCol,
      bucketLogRatios(corpus, textCol, isTarget, b), b)
}
