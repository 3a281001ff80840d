package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level text indexing: TF-IDF term scoring and an inverted
  * (posting-list) index served from an on-disk artifact — the search
  * side of the text-analysis surface (the reference's text handling
  * stops at `locate(...)>0` substring routing, `2.2
  * loading-lambda-for-mysql.py:334-349`; corpus-scale term lookup
  * needs an index, not a scan).
  *
  * Both operators share the tokenizer with the rest of the text
  * surface ([[TextFunctions.tokens]]) so budgets, vocab and postings
  * agree on what a token is.
  */
object TextIndex {

  /** TF-IDF top-`k` terms per document. Plan shape: explode → (doc,
    * term) aggregate (the only corpus-sized shuffle — map-side partial
    * count shrinks it immediately), document frequencies from the
    * ALREADY-aggregated tf table (vocab-grain, not corpus-grain), the
    * 1-row corpus size broadcast, then a row_number window whose
    * partitions are single documents — bounded by one doc's distinct
    * terms, never the corpus (the aggregate-first discipline).
    *
    * score = tf · ln(N / df), evaluated in a fixed double order so
    * engines agree; ties break on the term for determinism.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("_df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfc, Seq("term"))
      .join(broadcast(n))
      .withColumn("score",
        col("tf") * log(col("_n").cast("double") / col("_df")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("score"))
  }

  /** Distinct (term, doc) postings as a build-once/load-many artifact
    * (the [[Dedup.pairTable]] pattern), hash-bucketed into `buckets`
    * directory partitions by `pmod(xxhash64(term), buckets)`. A term
    * lookup therefore reads ~1/`buckets` of the index via partition
    * pruning instead of scanning the corpus — the difference between
    * an index probe and a full scan at 100 TB. `_SUCCESS` gates reuse;
    * a killed build leaves no marker and rebuilds. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String,
      basePath: String, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val spark = docs.sparkSession
    val path = s"$basePath/postings_b$buckets"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"),
          col(idCol).as("doc_id"))
        .distinct()
        .withColumn("_bkt", pmod(xxhash64(col("term")), lit(buckets)))
        .repartition(buckets, col("_bkt"))
        .write.partitionBy("_bkt").mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Conjunctive (AND) term search over a postings artifact: documents
    * containing EVERY query term. The probe filters on the partition
    * column first — bucket values come from the engine's own hash via
    * a planning-time 1-row local projection (LocalTableScan, no
    * cluster job), so probe and artifact can never disagree — then
    * counts distinct matched terms per doc; `count == |terms|` is the
    * intersection. Work ∝ the query terms' posting lists, never the
    * corpus. */
  def search(postings: DataFrame, terms: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    require(terms.distinct.size == terms.size,
      s"repeated query terms are redundant: $terms")
    val spark = postings.sparkSession
    val probe = spark.range(1)
      .select(terms.map(tm =>
        pmod(xxhash64(lit(tm)), lit(buckets)).as(tm)): _*).head()
    val bkts = terms.indices.map(probe.getLong(_)).distinct
    postings
      .filter(col("_bkt").isin(bkts: _*) && col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("_n"))
      .filter(col("_n") === terms.size)
      .select(col("doc_id"))
  }
}
