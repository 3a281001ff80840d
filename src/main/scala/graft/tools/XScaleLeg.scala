package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× SCALE LEG for the r21-optimized x-family heavy hitters
  * (VERDICT r21 #2): the spread guard and the latestRowPerKey
  * aggregate rewrite claim scale properties (guard no-ops on
  * multi-split input; growth ≤ ~linear) that were argued, not
  * measured. This leg times the named gates at sf0.1 and at a
  * synthetic 10× corpus and prints the growth ratio per gate; it also
  * dumps each gate's plan at BOTH scales so the no-spread-exchange
  * claim is checkable (`plans/r22/<gate>_x10.txt` — at 10× the corpus
  * is a multi-file Spark write, so the scan has many splits and
  * `Tables.spread`'s guard must decline).
  *
  * Corpus construction (the QScaleLeg discipline — scale the DATA
  * without distorting the WORKLOAD SHAPE):
  *   - `documents`: 10 replicas, doc_id shifted by i·(max+1); text
  *     passed through a per-replica letter rotation (translate) so
  *     replicas are DISSIMILAR — verbatim copies would put every doc
  *     in a 10-clique of near-duplicates and grow the dedup gates'
  *     candidate-pair mass quadratically, measuring corpus distortion
  *     instead of scaling. Within-replica duplicate structure (the
  *     thing the gates mine) is preserved exactly, so pairs scale
  *     linearly by construction.
  *   - `embeddings`: vec_id shifted; vectors offset by i·0.001 so
  *     replicas are distinct points of the same distribution (verbatim
  *     copies would make every vector a 10-way exact duplicate and
  *     degenerate the IVF cell geometry).
  *   - `lineitem`: key-domain shifts as QScaleLeg (10× rows AND 10×
  *     key cardinality — a16's CMS sees a real 10× key universe).
  *
  * Protocol per gate and scale: 1 untimed warmup (JIT + artifact
  * build — the synthetic dir builds its own artifacts), then median of
  * 3. Near-linear ratio ≈ 10 is the pass; super-linear names a plan
  * problem.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.XScaleLeg
  *   [gates,comma-sep]" */
object XScaleLeg {
  def main(args: Array[String]): Unit = {
    val gates =
      if (args.nonEmpty) args(0).split(",").toSeq.map(_.trim)
      else Seq("x_dedup_ngram", "x_dedup_containment",
        "x_dedup_incremental", "x_text_tfidf", "x_text_chunks_cdc",
        "a16_cms_freq", "x_sim_ivf", "x_sim_ivf_probe")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    val src = "/root/testdata/sf0.1"
    val synth = new java.io.File("work/sf1synthx").getAbsolutePath
    val factor = 10
    val tables = Seq("documents", "embeddings", "lineitem")
    if (!tables.forall(tn =>
        new java.io.File(s"$synth/$tn.parquet/_SUCCESS").exists())) {
      // documents: shifted ids + per-replica letter rotation
      val docs = graft.Tables.load(spark, src, "documents")
      val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      (0 until factor).map { i =>
        val rot = alpha.drop(i) + alpha.take(i)
        docs.select(
          (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
          (if (i == 0) col("text")
           else translate(col("text"), alpha, rot)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        // 64 output files: a real 10× corpus is many-split — and ONLY a
        // scan with ≥ core-count splits can demonstrate the spread
        // guard's no-op (10 splits on 32 cores would make spreading the
        // CORRECT call, and the leg would measure the wrong claim)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$synth/documents.parquet")
      val emb = graft.Tables.load(spark, src, "embeddings")
      val maxVec = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      (0 until factor).map { i =>
        emb.select(
          (col("vec_id") + lit(i * maxVec)).as("vec_id"),
          expr(s"transform(embedding, v -> cast(v + ${i * 0.001} as float))")
            .as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$synth/embeddings.parquet")
      val li = graft.Tables.load(spark, src, "lineitem")
      val liTypes = li.schema.fields.map(f => f.name -> f.dataType).toMap
      def maxOf(c: String): Long =
        li.agg(max(col(c).cast("long"))).head().getLong(0) + 1
      val units = Map("l_orderkey" -> maxOf("l_orderkey"),
        "l_partkey" -> maxOf("l_partkey"),
        "l_suppkey" -> maxOf("l_suppkey"))
      (0 until factor).map { i =>
        units.foldLeft(li) { case (df, (c, u)) =>
          df.withColumn(c, (col(c) + lit(i * u)).cast(liTypes(c)))
        }
      }.reduce(_ unionByName _)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$synth/lineitem.parquet")
    }
    new java.io.File("plans/r22").mkdirs()
    def timeGate(name: String, dir: String): Double = {
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup + artifact build
      val ss = (1 to 3).map(_ => once()).sorted
      ss(1)
    }
    gates.foreach { g =>
      val t01 = timeGate(g, src)
      val t1 = timeGate(g, synth)
      // plan at 10×: the spread-guard no-op evidence (no
      // REPARTITION_BY_NUM / RoundRobinPartitioning exchange may appear
      // for the multi-split synthetic scan)
      val plan = graft.SparkEntry.queries(g)(spark, synth)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r22/${g}_x10.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val spreadExchanges = plan.linesIterator.count(l =>
        l.contains("REPARTITION_BY_NUM"))
      println(f"[xscaleleg] gate=$g sf01=$t01%.2f x10=$t1%.2f " +
        f"ratio=${t1 / t01}%.2f perdata=${t1 / t01 / factor}%.3f " +
        s"spread_exchanges_at_x10=$spreadExchanges")
    }
    spark.stop()
  }
}
