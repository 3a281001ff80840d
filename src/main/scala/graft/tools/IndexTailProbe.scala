package graft.tools

import graft.operators.{TextIndex, Upsert}
import graft.streaming.{CdfSource, IndexSink}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LONG-TAIL maintenance probe (VERDICT r17 #2 + #3): drive 100+ real
  * Structured Streaming micro-batches through [[IndexSink.startBm25]]
  * / [[IndexSink.startIvf]] against one index and answer, with
  * numbers:
  *
  *   1. Does `compactEvery` BOUND the data-file count (the r17 gap:
  *      every batch lands a delta file set; a week-long tail is 10⁴
  *      sets whose listing every read pays)? Contrast leg with
  *      compactEvery=0 shows the unbounded growth.
  *   2. What does `_delta_*_SUCCESS` MARKER accumulation cost
  *      (markers are deliberately preserved by compaction — they are
  *      the redelivery fence)? Measured as committed-read resolution
  *      time at k batches: markers are consumed by ONE listStatus of
  *      the artifact root per read, so the claim is near-flat growth,
  *      with the escalation (fold old markers into a committed-token
  *      manifest keeping the newest K as files) named if the numbers
  *      say otherwise.
  *   3. Does per-batch apply time stay flat as the tail lengthens?
  *
  * Usage: `runMain graft.tools.IndexTailProbe [batches] [compactEvery]`.
  * Prints one line per checkpoint and a summary per leg. */
object IndexTailProbe {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 120
    val every = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fileStats(root: String): (Int, Int) = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var data = 0; var markers = 0
      def walk(d: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(d).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory) { if (!n.startsWith("_stage_")) walk(st.getPath) }
          else if (n.endsWith(".parquet")) data += 1
          else if (n.startsWith("_delta_") && n.endsWith("_SUCCESS"))
            markers += 1
        }
      walk(p)
      (data, markers)
    }

    def bm25Leg(tag: String, compactEvery: Int, nBatches: Int): Unit = {
      val w = java.nio.file.Files
        .createTempDirectory(s"graft_tailprobe_$tag").toString
      val tbl = s"$w/tbl"; val feed = s"$w/feed"; val idxBase = s"$w/idx"
      val keys = Seq("pd", "doc_id")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("pd", $"doc_id" % 4)
      Upsert.mergeIntoManifested(spark, tbl,
        shaped((1L to 40L).map(i => (i, s"seed doc $i spark join"))
          .toDF("doc_id", "text")).withColumn("ver", lit(1L)),
        keys, "pd", "ver", retain = 4)
      TextIndex.buildScoredPostings(
        Upsert.readManifestedAt(spark, tbl, 0), "doc_id", "text",
        idxBase, buckets = 4)
      val root = s"$idxBase/scored_postings_b4"
      var applied = 0.0
      (1 to nBatches).foreach { i =>
        val id = 1000L + i
        Upsert.mergeIntoManifested(spark, tbl,
          shaped(Seq((id, s"streamed doc $id spark batch $i"))
            .toDF("doc_id", "text")).withColumn("ver", lit(1L)),
          keys, "pd", "ver", retain = 4)
        CdfSource.pollOnce(spark, tbl, keys, feed)
        applied += timed {
          val q = IndexSink.startBm25(
            CdfSource.feedStream(spark, tbl, keys, feed),
            idxBase, "doc_id", "text", s"$w/ckpt", buckets = 4,
            compactEvery = compactEvery,
            progress = Some((feed, "probe")))
          require(q.awaitTermination(120000L), "tail did not drain")
        }
        CdfSource.pruneFeed(spark, feed)
        if (i % 20 == 0 || i == nBatches) {
          val (data, markers) = fileStats(root)
          val readSecs = timed {
            TextIndex.scoredPostingsReaders(spark, idxBase, buckets = 4)
          }
          val probeSecs = timed {
            val (p, st) = TextIndex.scoredPostingsReaders(spark,
              idxBase, buckets = 4)
            TextIndex.bm25TopK(p, st, Seq("spark"), k = 5, buckets = 4)
              .collect()
          }
          println(f"[tailprobe] bm25 leg=$tag batch=$i dataFiles=$data " +
            f"markers=$markers resolve=$readSecs%.3f probe=$probeSecs%.3f " +
            f"applyAvg=${applied / i}%.2f")
        }
      }
    }

    def ivfLeg(tag: String, compactEvery: Int, nBatches: Int): Unit = {
      val w = java.nio.file.Files
        .createTempDirectory(s"graft_tailprobe_$tag").toString
      val tbl = s"$w/tbl"; val feed = s"$w/feed"
      val keys = Seq("pb", "vec_id")
      val rnd = new scala.util.Random(7)
      def vecRows(ids: Seq[Long]) = ids.map { i =>
        (i, i % 4, Array.fill(8)(rnd.nextFloat()))
      }.toDF("vec_id", "pb", "embedding")
      // deliberately NOT normalizing containsNull: the natural
      // Seq[Array[Float]] batch shape must merge as-is (the relaxed
      // nullability compare in mergeIntoManifested)
      Upsert.mergeIntoManifested(spark, tbl,
        vecRows(1L to 64L).withColumn("ver", lit(1L)),
        keys, "pb", "ver", retain = 4)
      val idx = new graft.operators.IvfIndex(spark, s"$w/idx")
      idx.build(Upsert.readManifestedAt(spark, tbl, 0),
        "vec_id", "embedding", k = 4, iters = 2)
      var applied = 0.0
      (1 to nBatches).foreach { i =>
        Upsert.mergeIntoManifested(spark, tbl,
          vecRows(Seq(1000L + i)).withColumn("ver", lit(1L)),
          keys, "pb", "ver", retain = 4)
        CdfSource.pollOnce(spark, tbl, keys, feed)
        applied += timed {
          val q = IndexSink.startIvf(
            CdfSource.feedStream(spark, tbl, keys, feed),
            idx, "vec_id", "embedding", s"$w/ckpt",
            compactEvery = compactEvery,
            progress = Some((feed, "probe")))
          require(q.awaitTermination(120000L), "tail did not drain")
        }
        CdfSource.pruneFeed(spark, feed)
        if (i % 20 == 0 || i == nBatches) {
          val (data, markers) = fileStats(idx.basePath)
          val probeSecs = timed {
            idx.search("vec_id", "embedding",
              Seq.fill(8)(0.5), 5, 2).collect()
          }
          println(f"[tailprobe] ivf leg=$tag batch=$i dataFiles=$data " +
            f"markers=$markers probe=$probeSecs%.3f " +
            f"applyAvg=${applied / i}%.2f")
        }
      }
    }

    bm25Leg("compacted", every, batches)
    bm25Leg("unbounded", 0, math.min(40, batches))
    ivfLeg("compacted", every, math.min(60, batches))
    spark.stop()
  }
}
