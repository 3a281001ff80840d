package graft.tools

import graft.Tables
import graft.operators.{IncrementalAgg, StagedCommit, Upsert}
import graft.streaming.CdfSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-15/16 incremental-consumption layer
  * (VERDICT r15 #7): `cdf_cost` pinned changesBetween flat at x10;
  * this probe runs the two operators BUILT ON it at up to x30 —
  *
  *  - [[CdfSource.pollOnce]]: one poll over a one-month update
  *    interval — manifest-diff pruning + the span walk + the feed
  *    append. Claim: flat as the table and its partition count grow
  *    (cost = changed partitions + O(epochs) manifest lines).
  *  - [[IncrementalAgg.applyChanges]]: the MV fold — state grows with
  *    the group count (months ∝ factor), the delta stays one month.
  *    Claim: O(|state| + |delta groups|), so the fold moves with the
  *    group-grain state (tiny rows), never the fact table.
  *  - [[IncrementalAgg.applyChangesMulti]] with a delete in the feed
  *    that retires group extrema: the repair reads the base SEMI-JOINED
  *    to the dirty groups only — flat in table size for a fixed dirty
  *    set (the base read is partition-pruned by the group keys here,
  *    the honest best case; an unpartitioned grouping pays a pruned
  *    scan instead).
  *
  * Table shape mirrors MergeProbe: month(o_orderdate) partitions,
  * `factor` replicas with distinct months and offset keys, so factor N
  * = N× rows AND N× partitions while the touched month keeps its
  * original row count.
  *
  * Usage: `runMain graft.tools.CdfMvProbe <sfDir> [factor] [runs]`. */
object CdfMvProbe {
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
    val base = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        col("o_totalprice"))
    val maxKey = base.agg(max(col("o_orderkey"))).head().getLong(0)
    val orders =
      if (factor <= 1) base
      else (0 until factor).map { i =>
        if (i == 0) base
        else base.select(
          (col("o_orderkey") + lit(i * (maxKey + 1))).as("o_orderkey"),
          concat(lit(s"r$i-"), col("ym")).as("ym"),
          col("o_totalprice"))
      }.reduce(_ unionByName _)
    val n = orders.count()
    val months = orders.select(col("ym")).distinct().count()
    val oneMonth = orders.select(col("ym")).orderBy(col("ym"))
      .head().getString(0)
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val keys = Seq("ym", "o_orderkey")
    val grp = Seq("ym")
    (1 to runs).foreach { run =>
      val work = java.nio.file.Files
        .createTempDirectory("graft_cdfmvprobe").toString
      val path = s"$work/tbl"
      Upsert.mergeIntoManifested(spark, path,
        orders.withColumn("ver", lit(1L)), keys, "ym", "ver", retain = 6)
      // the incremental batch arrives as its own file set (same
      // rationale as MergeProbe): don't time the corpus-union pipeline
      orders.filter(col("ym") === oneMonth).write.parquet(s"$work/batch")
      val touched = spark.read.parquet(s"$work/batch")
      val touchedRows = touched.count()
      Upsert.mergeIntoManifested(spark, path,
        touched.withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "ym", "ver", retain = 6)
      // leg 1: one poll over the (0,1] interval — flat claim
      val feedDir = s"$work/feed"
      val pollSecs = timed {
        assert(CdfSource.pollOnce(spark, path, keys, feedDir)
          .contains((0L, 1L)))
      }
      // leg 2: the (count,sum) MV fold — state = months ∝ factor,
      // delta = the one-month update's pre/post pairs
      val st0 = IncrementalAgg.sumState(
        Upsert.readManifestedAt(spark, path, 0), grp, "o_totalprice")
        .localCheckpoint(true)
      val stateRows = st0.count()
      val feed = StagedCommit.readCommitted(spark, feedDir)
        .localCheckpoint(true)
      val feedRows = feed.count()
      val foldSecs = timed {
        IncrementalAgg.applyChanges(st0, grp, "o_totalprice", feed)
          .count()
      }
      // leg 3: the multi-measure fold with extremum retirement — the
      // feed deletes the touched month's max rows so its group goes
      // DIRTY and repairs from the (partition-pruned) base read
      val stM = IncrementalAgg.multiState(
        Upsert.readManifestedAt(spark, path, 0), grp,
        Seq("o_totalprice")).localCheckpoint(true)
      val delFeed = touched.limit(50)
        .withColumn("_change_type", lit("delete"))
      val foldMultiSecs = timed {
        IncrementalAgg.applyChangesMulti(stM, grp, Seq("o_totalprice"),
          delFeed, Upsert.readManifested(spark, path)).count()
      }
      // leg 4 (VERDICT r16 #1): the same repair through the dirty-
      // PARTITION-bounded base reader — the group key is the partition
      // column, so readManifestedPartitions bounds the DRIVER-side
      // manifest/file listing by the dirty set too. Claim: FLAT in
      // total partition count, closing the one leg foldMultiRepair
      // showed growing (its executor scan was already pruned; its
      // listing was not).
      val foldPrunedSecs = timed {
        IncrementalAgg.applyChangesMultiPruned(stM, grp,
          Seq("o_totalprice"), delFeed,
          rows =>
            if (rows.isEmpty) Upsert.readManifested(spark, path)
            else Upsert.readManifestedPartitions(spark, path,
              rows.map(_.getString(0)).distinct)).count()
      }
      println(f"[cdfmvprobe] run$run factor=$factor n=$n months=$months " +
        f"touchedRows=$touchedRows stateRows=$stateRows " +
        f"feedRows=$feedRows poll=$pollSecs%.3f fold=$foldSecs%.3f " +
        f"foldMultiRepair=$foldMultiSecs%.3f " +
        f"foldMultiRepairPruned=$foldPrunedSecs%.3f")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
    spark.stop()
  }
}
