package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Head-to-head probe: uncapped [[Dedup.containmentPairs]] vs the
  * prefix-filtered [[Dedup.containmentPairsExact]] on the same corpus
  * (VERDICT r12 #3), plus the Jaccard siblings
  * ([[Dedup.ngramJaccardPairs]] maxBlock=0 vs
  * [[Dedup.ngramJaccardPairsExact]]) on the same corpus. Usage:
  * `runMain graft.tools.ContProbe <dir> <which> [runs]` with `which` ∈
  * {old, new, both} (containment) ∪ {jold, jnew, jboth} (Jaccard).
  * Env: SPARK_GRAFT_CONT_SKEW=1 appends identical boilerplate to every
  * doc (hot-shingle shape); SPARK_GRAFT_CONT_T overrides the threshold
  * (default 0.3). Prints per-run seconds and the result row count
  * (both forms must agree — the count printed is the cross-check). */
object ContProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args(1) else "both"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `skew`: append the same 12-token boilerplate to EVERY doc — ten
    // trigram shingles with df = N, the real-corpus stop-shingle shape
    // the uncapped form is quadratic in and BlowUp's replica-disjoint
    // corpus deliberately lacks
    val base = Tables.load(spark, dir, "documents")
    val docs =
      if (sys.env.get("SPARK_GRAFT_CONT_SKEW").contains("1"))
        base.withColumn("text", org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.lit(
            " this document is provided as is without warranty of any kind")))
      else base
    docs.count()
    def run(name: String)(f: => Long): Unit = (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[contprobe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      spark.catalog.clearCache()
    }
    val t = sys.env.getOrElse("SPARK_GRAFT_CONT_T", "0.3").toDouble
    if (which == "old" || which == "both")
      run("uncapped")(Dedup.containmentPairs(
        docs, "doc_id", "text", n = 3, threshold = t).count())
    if (which == "new" || which == "both")
      run("prefix")(Dedup.containmentPairsExact(
        docs, "doc_id", "text", n = 3, threshold = t).count())
    // jaccard siblings on the same corpus (threshold via CONT_T)
    if (which == "jold" || which == "jboth")
      run("j_uncapped")(Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 3, threshold = t, maxBlock = 0).count())
    if (which == "jnew" || which == "jboth")
      run("j_prefix")(Dedup.ngramJaccardPairsExact(
        docs, "doc_id", "text", n = 3, threshold = t).count())
    spark.stop()
  }
}
