package graft.tools

import graft.Tables
import graft.operators.{IvfIndex, IvfPq, LshIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** RETRIEVAL-QUALITY REGRESSION FENCE (VERDICT r18 #3): the ANN/BM25
  * correctness gates hash-match pipeline fidelity, not retrieval
  * quality — a quantization or maintenance change could silently
  * degrade recall while every gate stays green. This gate measures
  * recall@k for the five production ANN postures at FIXED
  * (corpus, queries, k, probe/rerank) settings and compares against
  * the committed floors in `RECALL.json`:
  *
  *   - `sq8_r20`     — flat int8 scalar quantization, rerank 2k
  *   - `bq_r40`      — 1-bit binary quantization, rerank 4k
  *   - `ivf_p2`      — IVF float probe, nprobe 2
  *   - `ivfpq_opq_p2_r40` — IVF + OPQ-rotated residual PQ, nprobe 2,
  *                     rerank 4k
  *   - `lsh_p2`      — sign-LSH forest (4×8 bits), 2 probes/table
  *
  * Round 20 adds CHURNED floors (VERDICT r19 #4): each persisted
  * posture re-measured after a fixed maintenance script (build 80% →
  * append 20% → delete 10% → purge → compact → recenter, within each
  * family's supported algebra) against exact top-k over the SURVIVING
  * corpus — quality drift through maintenance is exactly where a bug
  * hides while hash gates stay green:
  *
  *   - `ivf_p2_churned`, `ivfpq_opq_p2_r40_churned`, `lsh_p2_churned`
  *
  * Any metric more than `DropTolerance` (5 recall points) below its
  * floor prints a `RECALL REGRESSION` line and exits nonzero — run it
  * per round like the bench. `--record` rewrites `RECALL.json` from
  * the current measurement (do this ONLY with a named justification,
  * exactly like a FLOORS re-seed). Deliberately degraded settings
  * (e.g. `--rerank-scale 0.25`) prove the fence trips. */
object RecallGate {
  val DropTolerance = 0.05

  def main(args: Array[String]): Unit = {
    val record = args.contains("--record")
    val rerankScale = args.sliding(2).collectFirst {
      case Array("--rerank-scale", v) => v.toDouble
    }.getOrElse(1.0)
    val k = 10
    val nQueries = 32
    val dir = "/root/testdata/sf0.01"
    val floorsPath = java.nio.file.Paths.get("RECALL.json")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, dir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queryIds = emb.select("vec_id").orderBy("vec_id")
      .limit(nQueries).collect().map(_.getLong(0)).toSeq
    val queryVecs: Map[Long, Seq[Double]] = queryIds.map { qid =>
      qid -> emb.filter(col("vec_id") === qid)
        .head().getSeq[Float](1).map(_.toDouble).toSeq
    }.toMap
    val exactFull: Map[Long, Set[Long]] = queryIds.map { qid =>
      qid -> Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queryVecs(qid), k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    val exactSansSelf: Map[Long, Set[Long]] = queryIds.map { qid =>
      qid -> Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= qid),
          "vec_id", "embedding", queryVecs(qid), k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    def rr(n: Int): Int = math.max(k, (n * rerankScale).toInt)

    def mean(per: Long => Set[Long], exact: Map[Long, Set[Long]]): Double =
      queryIds.map(q => (exact(q) & per(q)).size.toDouble / k).sum /
        queryIds.size

    val maxAbs = Similarity.sqMaxAbs(emb, "embedding")
    val sq8 = mean(q => Similarity.sqTopK(
        emb.filter(col("vec_id") =!= q), "vec_id", "embedding",
        queryVecs(q), k, rr(2 * k), maxAbs)
      .select("vec_id").collect().map(_.getLong(0)).toSet, exactSansSelf)

    val bqMeans = Similarity.bqMeans(emb, "embedding")
    val bq = mean(q => Similarity.bqTopK(
        emb.filter(col("vec_id") =!= q), "vec_id", "embedding",
        queryVecs(q), k, rr(4 * k), bqMeans)
      .select("vec_id").collect().map(_.getLong(0)).toSet, exactSansSelf)

    val ivf = new IvfIndex(spark, java.nio.file.Files
      .createTempDirectory("recallgate_ivf").toString)
    ivf.build(emb, "vec_id", "embedding", k = 8, iters = 3)
    val ivfR = mean(q => ivf.search("vec_id", "embedding", queryVecs(q),
        k, nprobe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet, exactFull)

    val comp = new IvfPq(spark, ivf, java.nio.file.Files
      .createTempDirectory("recallgate_ivfpq").toString)
    comp.build("vec_id", "embedding", m = 8, k = 64, iters = 3,
      rotate = true)
    val ivfpq = mean(q => comp.search("vec_id", "embedding",
        queryVecs(q), k, rr(4 * k), nprobe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet, exactFull)

    val lsh = new LshIndex(spark, java.nio.file.Files
      .createTempDirectory("recallgate_lsh").toString,
      dim = 64, numTables = 4, bitsPerTable = 8, seed = 42L)
    lsh.build(emb, "vec_id", "embedding")
    val lshR = mean(q => lsh.search("vec_id", "embedding", queryVecs(q),
        k, probes = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet, exactFull)

    // ── CHURNED-INDEX LEG (VERDICT r19 #4) ─────────────────────────
    // The floors above measure FRESH builds; quality drift through the
    // maintenance algebra (append → delete → purge → compact →
    // recenter) is exactly where a bug hides while the hash gates stay
    // green — a purge that rewrites cells slightly wrong, a compact
    // that drops a posting, a recenter that degrades assignment. Each
    // persisted posture runs a FIXED deterministic maintenance script
    // before measuring, within its supported algebra:
    //   - ivf:  build 80% → append 20% → delete 10% → purge →
    //           compact → recenter → search
    //   - ivfpq: parent build 80% → codes build → paired appends →
    //           compact → search (the PQ family's algebra has no
    //           delete — scripts stay inside supported ops)
    //   - lsh:  build 80% → append 20% → delete 10% → purge →
    //           compact → search
    // Recall is measured against exact top-k over the SURVIVING
    // corpus, so a maintenance step that loses or resurrects rows
    // shows up as recall, not just as a hash mismatch elsewhere.
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val tail = emb.filter(col("vec_id") % 5 === 0)
    val delIds = emb.select("vec_id").filter(col("vec_id") % 10 === 7)
    val survivors = emb.filter(col("vec_id") % 10 =!= 7)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactSurv: Map[Long, Set[Long]] = queryIds.map { qid =>
      qid -> Similarity.bruteForceTopK(survivors, "vec_id", "embedding",
          queryVecs(qid), k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap

    val ivfC = new IvfIndex(spark, java.nio.file.Files
      .createTempDirectory("recallgate_ivf_churn").toString)
    ivfC.build(base, "vec_id", "embedding", k = 8, iters = 3)
    ivfC.append(tail, "vec_id", "embedding")
    ivfC.delete(delIds, "vec_id")
    ivfC.purgeDeletes("vec_id")
    ivfC.compact()
    ivfC.recenter("embedding")
    val ivfChurn = mean(q => ivfC.search("vec_id", "embedding",
        queryVecs(q), k, nprobe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet, exactSurv)

    val ivfP = new IvfIndex(spark, java.nio.file.Files
      .createTempDirectory("recallgate_ivfpq_churn_parent").toString)
    ivfP.build(base, "vec_id", "embedding", k = 8, iters = 3)
    val compC = new IvfPq(spark, ivfP, java.nio.file.Files
      .createTempDirectory("recallgate_ivfpq_churn").toString)
    compC.build("vec_id", "embedding", m = 8, k = 64, iters = 3,
      rotate = true)
    ivfP.append(tail, "vec_id", "embedding")
    compC.append(tail, "vec_id", "embedding")
    compC.compact()
    val ivfpqChurn = mean(q => compC.search("vec_id", "embedding",
        queryVecs(q), k, rr(4 * k), nprobe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet, exactFull)

    val lshC = new LshIndex(spark, java.nio.file.Files
      .createTempDirectory("recallgate_lsh_churn").toString,
      dim = 64, numTables = 4, bitsPerTable = 8, seed = 42L)
    lshC.build(base, "vec_id", "embedding")
    lshC.append(tail, "vec_id", "embedding")
    lshC.delete(delIds, "vec_id")
    lshC.purgeDeletes("vec_id")
    lshC.compact()
    val lshChurn = mean(q => lshC.search("vec_id", "embedding",
        queryVecs(q), k, probes = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet, exactSurv)

    val current = Seq(
      "sq8_r20" -> sq8, "bq_r40" -> bq, "ivf_p2" -> ivfR,
      "ivfpq_opq_p2_r40" -> ivfpq, "lsh_p2" -> lshR,
      "ivf_p2_churned" -> ivfChurn,
      "ivfpq_opq_p2_r40_churned" -> ivfpqChurn,
      "lsh_p2_churned" -> lshChurn)
    current.foreach { case (n, v) =>
      println(f"[recallgate] $n recall@$k=$v%.4f")
    }
    if (record) {
      val json =
        s"""{
           | "k": $k, "queries": $nQueries, "sf": "sf0.01",
           | "tolerance": $DropTolerance,
           | "floors": {
           |${current.map { case (n, v) => f"""  "$n": $v%.4f""" }
            .mkString(",\n")}
           | }
           |}
           |""".stripMargin
      java.nio.file.Files.write(floorsPath, json.getBytes("UTF-8"))
      println(s"[recallgate] RECORDED floors to $floorsPath")
    } else {
      val text = new String(
        java.nio.file.Files.readAllBytes(floorsPath), "UTF-8")
      val FloorRe = """"([a-z0-9_]+)":\s*([0-9.]+)""".r
      val floors = FloorRe.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter(kv => current.exists(_._1 == kv._1)).toMap
      var failed = false
      current.foreach { case (n, v) =>
        floors.get(n).foreach { fl =>
          if (v < fl - DropTolerance) {
            failed = true
            println(f"[recallgate] RECALL REGRESSION: $n $v%.4f is " +
              f"more than ${DropTolerance} below its floor $fl%.4f")
          }
        }
      }
      if (failed) { spark.stop(); sys.exit(1) }
      println("[recallgate] all recall floors hold")
    }
    spark.stop()
  }
}
