package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: compare exact n-gram Jaccard pairs against MinHash-LSH
  * candidates (exact-verified) at a given threshold — quantifies LSH
  * recall on the actual corpus before switching a pair source. */
object PairCheck {
  def main(args: Array[String]): Unit = {
    val threshold = args.headOption.map(_.toDouble).getOrElse(0.5)
    // mirror the gate queries' stop-shingle cap so recall is measured on
    // the same shingle universe the production path uses
    val maxBlock = args.lift(1).map(_.toLong).getOrElse(1000L)
    // defaults mirror the x_dedup_minhash GATE banding (64 hashes × 16
    // bands — the config whose recall the oracle-safety argument cites);
    // pass 64 32 to measure the x_dedup_cluster pairTable config instead
    val numHashes = args.lift(2).map(_.toInt).getOrElse(64)
    val bands = args.lift(3).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = Tables.load(spark, dir, "documents")
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, threshold,
          maxBlock = maxBlock)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3,
          numHashes = numHashes, bands = bands, threshold = threshold,
          maxBlock = maxBlock)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val minJ = if (exact.isEmpty) 1.0 else exact.map(_._3).min
      println(s"[paircheck] $sf threshold=$threshold maxBlock=$maxBlock " +
        s"numHashes=$numHashes bands=$bands " +
        s"exact=${exact.size} lsh=${lsh.size} missed=${(exact -- lsh).size} " +
        s"spurious=${(lsh -- exact).size} minJaccard=$minJ")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
