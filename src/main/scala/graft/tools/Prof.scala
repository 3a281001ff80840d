package graft.tools

import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the bench's heavy queries: times each internal
  * stage separately so optimization targets the real cost, not a guess.
  * Not part of the engine surface; run with
  * `sbt "runMain graft.tools.Prof /root/testdata/sf0.1"`. */
object Prof {
  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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
    val events = Tables.load(spark, dir, "events")
    time("warm: docs.count")(docs.count())
    time("warm: events.count")(events.count())

    // ── events / f_json_struct ──
    println("events rows=" + events.count() +
      " avg(len(props))=" + events.agg(avg(length(col("props")))).first().get(0))
    time("f_json_struct: from_json agg") {
      events.select(from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("j"))
        .select(col("j.k").as("k"))
        .groupBy(pmod(col("k"), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n"), max(col("k")).as("mx")).collect()
    }
    time("f_json_struct variant: get_json_object") {
      events.select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(pmod(col("k"), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n"), max(col("k")).as("mx")).collect()
    }

    // ── dedup internals ──
    println("docs rows=" + docs.count() +
      " avg(len(text))=" + docs.agg(avg(length(col("text")))).first().get(0))
    val idx = docs.select(col("doc_id").as("_id"),
      explode(Dedup.shingles(col("text"), 3)).as("_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle index materialize")(println("idx rows=" + idx.count()))

    val sigCols64 = (0 until 64).map(i => min(xxhash64(lit(i), col("_sh"))).as(s"_h$i"))
    time("minhash 64 sig agg")(
      idx.groupBy(col("_id")).agg(sigCols64.head, sigCols64.tail: _*).count())
    val sigCols32 = (0 until 32).map(i => min(xxhash64(lit(i), col("_sh"))).as(s"_h$i"))
    time("minhash 32 sig agg")(
      idx.groupBy(col("_id")).agg(sigCols32.head, sigCols32.tail: _*).count())

    // hashed-shingle variant of the index
    val hidx = docs.select(col("doc_id").as("_id"),
      explode(Dedup.shingles(col("text"), 3)).as("_sh"))
      .select(col("_id"), xxhash64(col("_sh")).as("_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("hashed shingle index materialize")(println("hidx rows=" + hidx.count()))
    val hsig64 = (0 until 64).map(i => min(xxhash64(lit(i), col("_sh"))).as(s"_h$i"))
    time("minhash 64 sig agg (hashed idx)")(
      hidx.groupBy(col("_id")).agg(hsig64.head, hsig64.tail: _*).count())

    // ngram all-pairs intersect on string vs hashed shingles
    time("ngram intersect join (string)") {
      val a = idx.select(col("_id").as("id_a"), col("_sh"))
      val b = idx.select(col("_id").as("id_b"), col("_sh"))
      println("inter rows=" + a.join(b, a("_sh") === b("_sh") && col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1))).count())
    }
    time("ngram intersect join (hashed)") {
      val a = hidx.select(col("_id").as("id_a"), col("_sh"))
      val b = hidx.select(col("_id").as("id_b"), col("_sh"))
      println("inter rows=" + a.join(b, a("_sh") === b("_sh") && col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1))).count())
    }

    // full pair generators end-to-end
    time("minhashLshPairs 64/16 e2e")(
      println("pairs=" + Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.12).count()))
    time("minhashLshPairs 64/32 e2e (cluster's)")(
      println("pairs=" + Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 32, 0.5).count()))
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 32, 0.5)
      .select("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    time("connectedComponents on cached pairs")(
      println("labels=" + Dedup.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs).count()))
    // full x_dedup_cluster shape, cold (what the bench measures)
    spark.catalog.clearCache()
    time("x_dedup_cluster e2e cold") {
      val p2 = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 32, 0.5)
      println("cluster rows=" + Dedup.connectedComponents(
        docs.select(col("doc_id").as("id")), p2.select("id_a", "id_b"))
        .orderBy(col("id")).count())
    }
    time("simhashPairs e2e")(
      println("simpairs=" + Dedup.simhashPairs(docs, "doc_id", "text", 8).count()))

    // ── prefix-filtered exact Jaccard internals ──
    spark.catalog.clearCache()
    time("prefix: e2e") {
      println("prefix pairs=" + Dedup.ngramJaccardPairsExact(
        docs, "doc_id", "text", 3, 0.8).count())
    }
    spark.catalog.clearCache()
    locally {
      val flat = docs.select(col("doc_id").as("_id"),
          explode(Dedup.shingles(col("text"), 3)).as("_sh"))
        .select(col("_id"), xxhash64(col("_sh")).as("_sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("prefix: flat index")(println("flat=" + flat.count()))
      val freq = flat.groupBy(col("_sh")).agg(count(lit(1)).as("_df"))
      time("prefix: freq table")(println("vocab=" + freq.count()))
      val ds = flat.join(freq, Seq("_sh"))
        .groupBy(col("_id"))
        .agg(sort_array(collect_list(struct(col("_df"), col("_sh"))))
          .as("_toks"))
        .select(col("_id"), expr("transform(_toks, t -> t._sh)").as("_set"),
          size(col("_toks")).as("_sz"))
        .withColumn("_plen",
          (col("_sz") - ceil(lit(0.8) * col("_sz") - lit(1e-9)) + 1)
            .cast("int"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("prefix: docSets")(println("docSets=" + ds.count()))
      val plists = ds.select(col("_id"), col("_sz"),
          explode(slice(col("_set"), lit(1), col("_plen"))).as("_sh"))
        .groupBy(col("_sh"))
        .agg(sort_array(collect_list(struct(col("_sz"), col("_id"))))
          .as("_entries"))
      time("prefix: posting lists")(println("plists=" + plists.count()))
      val cands = plists
        .select(col("_entries"),
          posexplode(col("_entries")).as(Seq("_i", "_ea")))
        .select(col("_ea"),
          explode(slice(col("_entries"), col("_i") + lit(2),
            size(col("_entries")))).as("_eb"))
        .filter(lit(0.8) * col("_eb._sz") <= col("_ea._sz") + lit(1e-9))
        .select(least(col("_ea._id"), col("_eb._id")).as("id_a"),
          greatest(col("_ea._id"), col("_eb._id")).as("id_b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("prefix: candidates")(println("cands=" + cands.count()))
      val aSide = ds.select(col("_id").as("id_a"), col("_set").as("_seta"),
        col("_sz").as("_sza"))
      val bSide = ds.select(col("_id").as("id_b"), col("_set").as("_setb"),
        col("_sz").as("_szb"))
      time("prefix: verify join") {
        println("verified=" + cands.join(aSide, Seq("id_a"))
          .join(bSide, Seq("id_b"))
          .withColumn("_inter",
            size(array_intersect(col("_seta"), col("_setb"))))
          .filter(col("_inter") >= 1).count())
      }
      spark.catalog.clearCache()
    }

    // ivf index
    val emb = Tables.load(spark, dir, "embeddings")
    println("emb rows=" + emb.count())
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble)
    time("ivf: brute force topk")(
      Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", qv, 10).collect())

    spark.stop()
  }
}
