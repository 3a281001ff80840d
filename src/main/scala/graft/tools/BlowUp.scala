package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic corpus blow-up for scale probes (VERDICT r10 item 3).
  *
  * Replicates `documents` / `embeddings` / `events` FACTOR× into a probe
  * dir, symlinking the TPC-H tables unchanged, so the heavy-tail bench
  * queries can be measured at 2-10× the largest driver scale factor and
  * their empirical scaling exponents recorded in SCALE.md.
  *
  * The blow-up must model a corpus that is FACTOR× BIGGER, not FACTOR
  * copies of the same corpus — verbatim replication would make every
  * replica of a document a true near-duplicate of every other, inflating
  * the pair-generating operators quadratically in FACTOR for a reason no
  * real 10× corpus exhibits. Each replica r>0 therefore rewrites every
  * whitespace token with a replica suffix (`word` → `word~r`): shingle
  * spaces across replicas are disjoint, so per-replica duplicate density,
  * posting-list lengths, and cluster structure are identical to the base
  * corpus, and honest scaling is linear-in-FACTOR work over FACTOR× rows.
  * Replica 0 is the base corpus verbatim. Embedding replicas get a small
  * deterministic per-replica, per-dimension jitter (±0.08 max) for the
  * same reason: exact-copy vectors would collapse into zero-distance
  * pairs that IVF/LSH/near-dup operators never see at real scale.
  * Event replicas shift `event_id`/`user_id` into disjoint key ranges
  * (fresh users, same per-user behavior) and keep timestamps, so
  * sessionization/streaming state grows linearly in keys as it would
  * with a genuinely larger user base.
  */
object BlowUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: BlowUp <baseDir> <outDir> <factor>")
    val Array(base, out, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1 && factor <= 100, s"factor out of range: $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outPath = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outPath)

    def replicated(name: String): DataFrame =
      graft.Tables.load(spark, base, name)
        .withColumn("r", explode(sequence(lit(0L), lit(factor - 1L))))

    // documents: disjoint id ranges; per-token replica suffix for r>0
    val docs = graft.Tables.load(spark, base, "documents")
    val docSpan = docs.agg(max("doc_id")).head.getLong(0) + 1L
    replicated("documents")
      .withColumn("doc_id", col("doc_id") + col("r") * docSpan)
      .withColumn("text", when(col("r") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("~"), col("r"))), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: disjoint ids; deterministic jitter from (r, dim)
    val emb = graft.Tables.load(spark, base, "embeddings")
    val vecSpan = emb.agg(max("vec_id")).head.getLong(0) + 1L
    replicated("embeddings")
      .withColumn("vec_id", col("vec_id") + col("r") * vecSpan)
      .withColumn("embedding", when(col("r") === 0, col("embedding"))
        .otherwise(expr(
          "transform(embedding, (x, i) -> " +
            "cast(x + (pmod(r * 31 + i, 17) - 8) * 0.01 as float))")))
      .drop("r")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: fresh key ranges per replica, timestamps untouched
    val ev = graft.Tables.load(spark, base, "events")
    val evSpan = ev.agg(max("event_id")).head.getLong(0) + 1L
    val userSpan = ev.agg(max("user_id")).head.getLong(0) + 1L
    replicated("events")
      .withColumn("event_id", col("event_id") + col("r") * evSpan)
      .withColumn("user_id", col("user_id") + col("r") * userSpan)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // TPC-H tables ride along unchanged via symlink — the probe targets
    // the corpus operators; relational gates keep their sf0.1 inputs
    for (t <- graft.Tables.all
         if !Set("documents", "embeddings", "events").contains(t)) {
      val link = outPath.resolve(s"$t.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(s"$base/$t.parquet"))
    }
    println(s"""{"blowup":"$out","factor":$factor,"docSpan":$docSpan,"vecSpan":$vecSpan,"evSpan":$evSpan}""")
    spark.stop()
  }
}
