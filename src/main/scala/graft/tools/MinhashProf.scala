package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for the x_dedup_minhash regression (VERDICT r11 #3):
  * times each internal stage of the current capped minhash path against
  * the r2-era window-capped flat-index shape, so the fix targets the
  * real cost. Not part of the engine surface. */
object MinhashProf {
  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, dir, "documents")
    time("warm: docs.count")(docs.count())

    // full current path, several runs (variance probe)
    (1 to 5).foreach { i =>
      time(s"full minhashLshPairs run $i") {
        Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, numHashes = 64, bands = 16, threshold = 0.5,
          maxBlock = 1000).count()
      }
      spark.catalog.clearCache()
    }

    // stage: posting lists build (current capped index)
    val flat = docs
      .select(col("doc_id").as("_id"),
        explode(Dedup.shingles(col("text"), 3)).as("_sh"))
      .select(col("_id"), xxhash64(col("_sh")).as("_sh"))
    val lists = flat.groupBy(col("_sh"))
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")) <= 1000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("postingLists materialize")(println("lists=" + lists.count()))
    val idxFromLists = lists.select(explode(col("_ids")).as("_id"),
      col("_sh"))
    val sigCols = (0 until 64).map(i =>
      min(xxhash64(lit(i), col("_sh"))).as(s"_h$i"))
    time("sig agg from lists")(
      idxFromLists.groupBy(col("_id")).agg(sigCols.head, sigCols.tail: _*)
        .count())
    time("sig agg from lists again")(
      idxFromLists.groupBy(col("_id")).agg(sigCols.head, sigCols.tail: _*)
        .count())
    spark.catalog.clearCache()

    // candidate + verify sub-stages over the posting-list index
    val sig = idxFromLists.groupBy(col("_id"))
      .agg(sigCols.head, sigCols.tail: _*)
    val banded = sig.select(col("_id"),
      explode(array((0 until 16).map(b =>
        struct(lit(b).as("band"),
          xxhash64((b * 4 until (b + 1) * 4)
            .map(i => col(s"_h$i")): _*).as("bkey"))): _*)).as("_b"))
      .select(col("_id"), col("_b.band"), col("_b.bkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("banded materialize")(println("banded=" + banded.count()))
    val l = banded.select(col("_id").as("id_a"), col("band"), col("bkey"))
    val r2 = banded.select(col("_id").as("id_b"), col("band"), col("bkey"))
    val cand = l.join(r2, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("candidates materialize")(println("cand=" + cand.count()))
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("_id")).distinct()
    val sizes = idxFromLists.join(candIds, Seq("_id"), "left_semi")
      .groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    time("sizes")(sizes.count())
    val inter = cand
      .join(idxFromLists.select(col("_id").as("id_a"), col("_sh")), "id_a")
      .join(idxFromLists.select(col("_id").as("_idb"), col("_sh").as("_sh2")),
        col("id_b") === col("_idb") && col("_sh") === col("_sh2"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("_inter"))
    time("intersections")(inter.count())
    spark.catalog.clearCache()

    spark.stop()
  }
}
