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

  // ---------------------------------------------------------------------
  // Trained logistic scorer — full-batch gradient descent IN the engine
  // (the CCNet/GPT-3 model-stage shape: labels from a heuristic or seed
  // set, smooth scores out). Complements scoreLinear: that op APPLIES a
  // pluggable hashed-weight model; this one TRAINS a small dense-feature
  // model distributedly.
  //
  // Scale posture: each iteration is ONE map-side-combinable aggregate
  // (J+1 decimal sums, J = #features); driver state is the O(J) weight
  // vector; scoring is a scan-stage expression, zero shuffles.
  //
  // Determinism contract (what lets a DuckDB oracle RETRAIN the model
  // digit-for-digit):
  //  - features must be exact ≤6-decimal values (integer-ppm derived);
  //  - per-row probabilities round to 6 decimals BEFORE the residual, so
  //    every gradient term (p₆ − y)·x is within 1 ulp of an exact
  //    12-decimal value and the decimal(20,12) cast lands on it exactly
  //    on ANY engine — the gradient sum is then integer-exact, immune to
  //    partition-order drift and to cross-engine exp() ulp noise (a
  //    1-ulp sigmoid difference moves a 6-decimal rounding only within
  //    ~1e-10 of a boundary, vs the ~1e-4 per-term hazard of casting
  //    raw doubles to 12 decimals);
  //  - weight updates replay the IEEE-double expression `w − lr·(S/n)`
  //    in fixed evaluation order on both engines.
  // ---------------------------------------------------------------------

  /** Train logistic weights by `iters` rounds of full-batch gradient
    * descent at learning rate `lr` over `xCols` (plus an implicit
    * leading bias feature of 1.0). `yCol` must be 0.0/1.0 doubles.
    * Returns the weight vector [bias, w₁, …] — O(#features), the one
    * sanctioned driver-side materialization here. */
  def trainLogistic(feats: DataFrame, xCols: Seq[String], yCol: String,
                    iters: Int, lr: Double): Array[Double] = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    require(lr > 0.0 && lr <= 10.0, s"lr out of range: $lr")
    require(xCols.nonEmpty, "need at least one feature column")
    val n = feats.count()
    require(n > 0, "cannot train on an empty frame")
    var w = Array.fill(xCols.size + 1)(0.0)
    for (_ <- 1 to iters) {
      val err = prob6(xCols.map(col), w) - col(yCol)
      val terms = (lit(1.0) +: xCols.map(col)).zipWithIndex.map {
        case (x, j) => sum((err * x).cast("decimal(20,12)")).as(s"s$j")
      }
      val sums = feats.agg(terms.head, terms.tail: _*).head
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (sums.getDecimal(j).doubleValue() / n)
      }
    }
    w
  }

  /** The 6-decimal-rounded sigmoid score under `w` — the scan-stage
    * inference expression. z folds left-to-right
    * (((b + w₁x₁) + w₂x₂) + …) so the oracle's replay is
    * operation-for-operation identical. */
  def prob6(xs: Seq[Column], w: Array[Double]): Column = {
    require(w.length == xs.length + 1,
      s"weight length ${w.length} != features ${xs.length} + bias")
    val z = xs.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (x, j)) => acc + lit(w(j + 1)) * x
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }
}
