package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language model for data-quality scoring — the KenLM
  * shape a training-data pipeline runs to rank documents by fluency
  * before mixing (cf. CCNet's per-paragraph LM perplexity filter):
  * train bigram/unigram count tables over the corpus, score each
  * document by average bigram log-probability under stupid backoff
  * (Brants et al. 2007: no discounting, a fixed backoff factor —
  * the large-data regime where smoothing stops mattering).
  *
  * Scale shape: training is two map-side-combinable count aggregations
  * (shuffle ∝ distinct n-grams, bounded by vocab and vocab², not corpus
  * size); scoring derives each doc's bigrams INSIDE the scan stage from
  * the token array (no per-doc window, no posexplode shuffle), then
  * joins the count tables — the unigram side is vocab-sized (broadcast
  * at any realistic vocab), the bigram join shuffles ∝ corpus tokens
  * once. Per-bigram log-probs are rounded to 6 dp and summed as
  * DECIMAL(18,6): a sum of 6-dp multiples is exact and
  * order-independent, so the doc score is reproducible bit-for-bit on
  * any engine or partitioning (the same trick as the PQ ADC total).
  */
object LanguageModel {

  private def toks(textCol: Column): Column = split(lower(textCol), " ", -1)

  /** Adjacent-pair structs derived from the token array in the scan
    * stage: `transform` indexes are 0-based, `element_at` is 1-based, so
    * position i pairs with i+2. Empty/one-token docs yield an empty
    * array (the `greatest` guard keeps `slice` in range). */
  private def bigramsOf(t: Column): Column =
    transform(slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      (w, i) => struct(w.as("w1"), element_at(t, i + lit(2)).as("w2")))

  /** (w, c1): token occurrence counts over the corpus. */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    // spread before tokenization: single-row-group scans pin the
    // explode to one core (no-op once the scan has ≥cores splits)
    graft.Tables.spread(docs.select(col(textCol)))
      .select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))

  /** (w1, w2, c12): adjacent-pair counts over the corpus. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    graft.Tables.spread(docs.select(col(textCol)))
      .select(explode(bigramsOf(toks(col(textCol)))).as("_bg"))
      .select(col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))

  /** Per-document average bigram log-probability under stupid backoff:
    * lp(w2|w1) = ln(c12/c1(w1)) when the bigram was seen, else
    * ln(alpha * c1(w2)/total). Returns (idCol, n_bigrams, avg_logp);
    * docs with fewer than two tokens have no bigrams and drop out.
    * `uni`/`bi` are [[unigramCounts]]/[[bigramCounts]] frames — train
    * and score corpora may differ (held-out scoring). */
  def scoreStupidBackoff(docs: DataFrame, idCol: String, textCol: String,
                         uni: DataFrame, bi: DataFrame,
                         alpha: Double = 0.4): DataFrame = {
    val tot = uni.agg(sum(col("c1")).cast("double").as("_t"))
    val bg = graft.Tables
      .spread(docs.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol),
        explode(bigramsOf(toks(col(textCol)))).as("_bg"))
      .select(col(idCol), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
    val lp = when(col("c12").isNotNull,
        log(col("c12") / col("_c1w1")))
      .otherwise(log(lit(alpha) * col("_c1w2") / col("_t")))
    bg
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("c1").as("_c1w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c1").as("_c1w2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col(idCol), round(lp, 6).cast("decimal(18,6)").as("_lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("_lp")).cast("double") / count(lit(1)), 6)
          .as("avg_logp"))
  }

  /** Build-once / load-many scored-corpus artifact (the
    * [[graft.operators.Dedup.pairTable]] pattern): train the corpus
    * bigram LM and score every doc ONCE, parquet the (id, n_bigrams,
    * avg_logp) result under `basePath`, and serve every later consumer
    * from the scan. The LM scoring pass is the dominant cost of both
    * the raw-score gate and the perplexity filter — sharing the
    * artifact means the corpus is scored once per artifact lifetime,
    * not once per consumer, and the filter's quantile probes run
    * against a tiny doc-grain parquet instead of a pinned cache (no
    * persist to leak). `_SUCCESS` is the build's atomicity marker —
    * a killed build leaves no marker and the next call rebuilds. */
  def scoredTable(docs: DataFrame, idCol: String, textCol: String,
                  basePath: String, alpha: Double = 0.4): DataFrame = {
    val spark = docs.sparkSession
    val path = s"$basePath/lm_scored_a$alpha"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      val uni = unigramCounts(docs, textCol)
      val bi = bigramCounts(docs, textCol)
      scoreStupidBackoff(docs, idCol, textCol, uni, bi, alpha)
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** PMI-scored collocations: pointwise mutual information of adjacent
    * pairs, ln(N·c12 / (c1(w1)·c1(w2))) with N = total bigram
    * positions, over pairs with c12 ≥ minCount (rare-pair PMI is pure
    * noise — the standard floor). The phrase-mining signal for
    * tokenizer/vocab construction: high-PMI pairs are the multiword
    * units worth a single token. All counts are the exact vocab-grain
    * aggregates of [[unigramCounts]]/[[bigramCounts]] (two map-side-
    * combinable shuffles — nothing corpus-sized past them); the PMI is
    * one ln over a <2⁵³-exact double product per SURVIVING pair,
    * rounded to 6 dp. Output: (w1, w2, c12, pmi). */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val uni = unigramCounts(docs, textCol)
    val nTot = bigramCounts(docs, textCol)
      .agg(sum(col("c12")).cast("double").as("_n"))
    bigramCounts(docs, textCol)
      .filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c1").as("_ca")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c1").as("_cb")), Seq("w2"))
      .crossJoin(broadcast(nTot))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(col("_n") * col("c12").cast("double") /
          (col("_ca").cast("double") * col("_cb").cast("double"))), 6)
          .as("pmi"))
  }

  /** CCNet-style head/middle/tail perplexity bucketing of a scored
    * corpus (`scored` = [[scoreStupidBackoff]] output; higher
    * `avg_logp` = lower perplexity = better). The tertile cutoffs come
    * from [[Quantiles.exactQuantile]] — histogram-guided exact
    * selection, NO global sort/window, so the bucketing is scan-stage
    * work plus two driver-bounded scalar searches at any corpus size
    * (a `ntile(3)` window here would funnel 100 TB through one
    * partition). Cutoffs are kth-smallest (k = ⌈q·n⌉) VALUES THE
    * COLUMN CONTAINS, so `v ≤ cutoff` is an exact double compare any
    * engine reproduces; ties at a cutoff land every tied doc in the
    * same bucket. Adds a `bucket` column: 'tail' (worst third),
    * 'middle', 'head'. The quality-filter composition keeps
    * `bucket != 'tail'` — the caller's one-line filter. */
  def perplexityBuckets(scored: DataFrame,
                        scoreCol: String = "avg_logp"): DataFrame = {
    val cut1 = Quantiles.exactQuantile(scored, scoreCol, 1.0 / 3)
    val cut2 = Quantiles.exactQuantile(scored, scoreCol, 2.0 / 3)
    scored.withColumn("bucket",
      when(col(scoreCol) <= cut1, lit("tail"))
        .when(col(scoreCol) <= cut2, lit("middle"))
        .otherwise(lit("head")))
  }
}
