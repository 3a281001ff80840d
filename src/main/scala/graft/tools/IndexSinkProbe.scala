package graft.tools

import graft.Tables
import graft.streaming.IndexSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the LIVE STREAMING INDEX CONSUMER (round 17): does
  * a feed micro-batch's apply cost stay bounded by the CHANGE volume
  * as the index grows? Fixed-shape batches against an IVF index at
  * x1/x10/x30 corpus size:
  *
  *   - `insertBatch` — 200 pure inserts (new ids). Claim: FLAT — the
  *     append assigns only the delta against the broadcast centroids
  *     and writes only its cells' delta files; nothing reads the
  *     existing mass.
  *   - `mixedBatch` — 100 in-place updates + 100 deletes. The deletes
  *     are metadata-sized (one tombstone delta); the update's purge
  *     carries the ONE index-sized leg: finding the affected cells is
  *     a column-pruned scan of the cells' id column (FAISS's
  *     remove_ids pays the same full-index id sweep), and the rewrite
  *     is bounded by the affected cells. Expected to grow with the
  *     id-column scan; the escalation if it ever matters is deriving
  *     the old rows' cells from the feed's PRE-IMAGES via the frozen
  *     quantizer (sound only while no splitHotCells has moved rows —
  *     epoch `cv`/mods gating would be needed), deliberately not
  *     taken while the id-column sweep is a column-pruned fraction of
  *     the index bytes.
  *
  * Usage: `runMain graft.tools.IndexSinkProbe <sfDir> [factor] [runs]`. */
object IndexSinkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 1
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val maxId = base.agg(max(col("vec_id"))).head().getLong(0)
    val corpus =
      if (factor <= 1) base
      else (0 until factor).map { i =>
        if (i == 0) base
        else base.select(
          (col("vec_id") + lit(i * (maxId + 1))).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
    val n = corpus.count()
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def feedBatch(rows: org.apache.spark.sql.DataFrame, change: String,
                  epoch: Long) =
      rows.withColumn("_change_type", lit(change))
        .withColumn("_from_epoch", lit(epoch - 1))
        .withColumn("_to_epoch", lit(epoch))
    (1 to runs).foreach { run =>
      val work = java.nio.file.Files
        .createTempDirectory("graft_idxsinkprobe").toString
      val idx = new graft.operators.IvfIndex(spark, s"$work/idx")
      idx.build(corpus, "vec_id", "embedding", k = 8, iters = 2,
        trainSample = 4096)
      // 200 brand-new ids, vectors borrowed from the corpus head
      val ins = feedBatch(base.limit(200)
        .select((col("vec_id") + lit((factor + 1) * (maxId + 1)))
          .as("vec_id"), col("embedding")), "insert", 1L)
      val insertSecs = timed {
        IndexSink.applyIvfBatch(spark, ins, 1L, idx, "vec_id",
          "embedding")
      }
      // 100 in-place updates (negated vectors) + 100 deletes of
      // existing ids — one mixed batch, netting disjoint by id
      val upd = feedBatch(base.filter(col("vec_id") < 100)
        .select(col("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")),
        "update_postimage", 2L)
      val del = feedBatch(base.filter(col("vec_id") >= 100 &&
          col("vec_id") < 200)
        .select(col("vec_id"), col("embedding")), "delete", 2L)
      val mixedSecs = timed {
        IndexSink.applyIvfBatch(spark, upd.unionByName(del), 2L, idx,
          "vec_id", "embedding")
      }
      println(f"[idxsinkprobe] run$run factor=$factor n=$n " +
        f"insertBatch=$insertSecs%.3f mixedBatch=$mixedSecs%.3f")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
    spark.stop()
  }
}
