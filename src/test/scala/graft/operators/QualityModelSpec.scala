package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("hashWeights is deterministic and bounded") {
    val w = QualityModel.hashWeights(64)
    assert(w.length == 64)
    assert(w.forall(x => x >= -1000L && x <= 1000L))
    assert(w.toSeq == QualityModel.hashWeights(64).toSeq)
    assert(w(0) == -1000L) // (0 * c) % 2001 - 1000
  }

  test("scoreLinear folds bucket weights exactly, keep thresholds at 0") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha alpha alpha"))
      .toDF("doc_id", "text")
    val w = QualityModel.hashWeights(64)
    // independent reference: bucket each token via the same md5₃₂
    def bucket(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    val expect = Map(
      1L -> (w(bucket("alpha")) + w(bucket("beta"))),
      2L -> (3 * w(bucket("alpha"))))
    val rows = QualityModel.scoreLinear(docs, "doc_id", "text", w)
      .as[(Long, Long, Int)].collect()
    assert(rows.map { case (id, l, _) => id -> l }.toMap == expect)
    rows.foreach { case (_, logit, keep) =>
      assert(keep == (if (logit >= 0) 1 else 0))
    }
  }

  test("bias shifts the logit") {
    val docs = Seq((1L, "alpha")).toDF("doc_id", "text")
    val w = QualityModel.hashWeights(8)
    val base = QualityModel.scoreLinear(docs, "doc_id", "text", w)
      .select("logit_micro").as[Long].head()
    val shifted = QualityModel
      .scoreLinear(docs, "doc_id", "text", w, biasMicro = 500L)
      .select("logit_micro").as[Long].head()
    assert(shifted == base + 500L)
  }
}
