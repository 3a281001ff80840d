package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear model application — the fastText-style quality
  * classifier shape a training-data pipeline runs over every document
  * (hash each token into a bounded feature space, sum the feature
  * weights, threshold the logit). The MODEL here is pluggable (any
  * micro-scaled integer weight vector); what this operator contributes
  * is the 100 TB-shaped application plumbing:
  *
  *  - features and the logit derive entirely INSIDE the scan stage
  *    (token → md5 bucket → weight lookup in a broadcast array literal →
  *    integer fold) — zero shuffles, no per-token explode;
  *  - all arithmetic is integer (micro-scaled weights, exact sums), so
  *    scores are order-independent and replayable by any engine with
  *    md5 — the same portability contract as the CMS/sampler hashes;
  *  - thresholding composes with the sampling/mixing operators as a
  *    codegen-friendly scan predicate.
  *
  * A real deployment drops in trained weights (the hash trick makes
  * training and serving agree on the feature space by construction);
  * [[hashWeights]] provides a deterministic stand-in so the gate's
  * oracle can re-derive the weights arithmetically.
  */
object QualityModel {

  /** Feature bucket of a token: md5₃₂(token) mod `numBuckets` — the
    * samplers' portable md5 coordinate ([[Sampling.hashHex]]), so any
    * engine replays the bucketing exactly. */
  def tokenBucket(tok: Column, numBuckets: Int): Column =
    pmod(conv(substring(md5(tok.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(numBuckets.toLong))

  /** Deterministic stand-in weight table (micro-scaled integers in
    * [-1000, 1000] ≈ [-0.001, 0.001]): w(b) = (b·2654435761) mod 2001
    * − 1000 (Knuth's multiplicative constant — spreads signs across
    * buckets). Arithmetically re-derivable in SQL. */
  def hashWeights(numBuckets: Int): Array[Long] =
    Array.tabulate(numBuckets)(b => (b.toLong * 2654435761L) % 2001L - 1000L)

  /** Per-document logit: biasMicro + Σ_tokens w[bucket(token)], summed
    * as exact micro-scaled integers in one scan-stage array fold.
    * Returns (idCol, logit_micro, keep) with keep = 1 iff the logit is
    * non-negative — the mix-ready filter column. */
  def scoreLinear(docs: DataFrame, idCol: String, textCol: String,
                  weightsMicro: Array[Long],
                  biasMicro: Long = 0L): DataFrame = {
    val d = weightsMicro.length
    require(d > 0, "weight table must be non-empty")
    val wArr = array(weightsMicro.map(lit(_)): _*)
    val toks = split(lower(col(textCol)), " ", -1)
    val logit = aggregate(
      transform(toks, t =>
        element_at(wArr, (tokenBucket(t, d) + 1).cast("int"))),
      lit(biasMicro), (acc, x) => acc + x)
    docs.select(col(idCol), logit.as("logit_micro"),
      when(logit >= 0, lit(1)).otherwise(lit(0)).as("keep"))
  }
}
