package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-training step of an LLM data pipeline, distributed the way
  * the FAISS-style operators train: per round, ONE vocab-sized Spark
  * aggregation finds the most frequent adjacent symbol pair, the argmax
  * (a single row) comes to the driver, and the merge applies to the
  * symbol state as a scan-stage string replace. k rounds = k bounded
  * driver round-trips; nothing corpus-sized is ever collected — the
  * corpus itself is touched exactly once (the word-count aggregate),
  * every round after runs over the DICTIONARY.
  *
  * Symbol state is a string with a TWO-space separator invariant
  * (`"  c1  c2  "`): the merge pattern `" a  b "` eats one space from
  * each side and the replacement `" ab "` restores them, so left-to-right
  * non-overlapping `replace` (identical semantics in the JVM and SQL
  * engines) merges every non-overlapping occurrence — including
  * back-to-back pairs — while "a a a" correctly yields "aa a", exactly
  * reference BPE. This representation is what makes the whole k-round
  * training loop REPLAYABLE as k unrolled SQL levels — the oracle
  * retrains, it does not trust.
  */
object Bpe {
  final case class Merge(rank: Int, lhs: String, rhs: String,
                         merged: String, pair_count: Long)

  /** Train `k` merges over the corpus; returns (rank, lhs, rhs, merged,
    * pair_count) with rank 1 = first merge. Stops early if no pair is
    * left (single-symbol dictionary). */
  def trainMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need at least one merge round: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = docs
      .select(explode(split(lower(col(textCol)), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    var state = wc.select(col("w"), col("c"),
        concat(lit("  "), array_join(split(col("w"), ""), "  "), lit("  "))
          .as("s"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val t = split(trim(col("s")), "  ")
      val pairs = state
        .select(col("c"), explode(
          transform(slice(t, lit(1), greatest(size(t) - 1, lit(0))),
            (x, i) => struct(x.as("a"), element_at(t, i + lit(2)).as("b"))))
          .as("_p"))
        .select(col("_p.a").as("a"), col("_p.b").as("b"), col("c"))
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("n"))
      val top = pairs.orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        // symbols descend from corpus word characters; the inlined
        // replace pattern must never smuggle SQL or regex syntax
        require((a + b).matches("[\\p{Alnum}]+"),
          s"non-alphanumeric symbol in merge: '$a'+'$b'")
        merges += Merge(r, a, b, a + b, n)
        state = state.withColumn("s",
          expr(s"replace(s, ' $a  $b ', ' $a$b ')")).localCheckpoint()
        r += 1
      }
    }
    spark.createDataFrame(merges.result())
      .select(col("rank"), col("lhs"), col("rhs"), col("merged"),
        col("pair_count"))
  }

  /** Apply a trained merge list to a one-column word frame (`w`),
    * adding `toks` (the word's BPE tokens, in order). The k replaces
    * chain as ONE scan-stage expression — zero shuffles; tokenizing the
    * DISTINCT word dictionary once and joining back (rather than
    * re-deriving per occurrence) is the aggregate-first deployment
    * shape. Same separator algebra as [[trainMerges]], so
    * train-then-apply composes exactly. */
  def tokenizeWords(words: DataFrame,
                    merges: Seq[(String, String)]): DataFrame = {
    merges.foreach { case (a, b) =>
      require((a + b).matches("[\\p{Alnum}]+"),
        s"non-alphanumeric symbol in merge: '$a'+'$b'")
    }
    val st0 = concat(lit("  "), array_join(split(col("w"), ""), "  "),
      lit("  "))
    val fin = merges.foldLeft(st0) { case (s, (a, b)) =>
      call_function("replace", s, lit(s" $a  $b "), lit(s" $a$b "))
    }
    words.withColumn("toks", split(trim(fin), "  "))
  }
}
