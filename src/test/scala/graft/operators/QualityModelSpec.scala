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

  private def sig6(z: Double): Double =
    BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("trainLogistic replays the hand-traced GD arithmetic exactly") {
    // two separable rows; w starts at 0 so iteration 1 sees p = 0.5
    val df = Seq((1.0, 1.0), (0.0, 0.0)).toDF("x1", "y")
    val w1 = QualityModel.trainLogistic(df, Seq("x1"), "y",
      iters = 1, lr = 0.5)
    // iter 1: err = (0.5-1, 0.5-0); s0 = 0, s1 = -0.5; n = 2
    assert(w1(0) == 0.0)
    assert(w1(1) == 0.5 * (0.5 / 2)) // 0.125
    val w2 = QualityModel.trainLogistic(df, Seq("x1"), "y",
      iters = 2, lr = 0.5)
    // iter 2 replayed with the same rounded-sigmoid + exact-sum scheme:
    // each gradient term is cast to decimal(20,12) before the sum
    val p1 = sig6(w1(0) + w1(1) * 1.0)
    val p0 = sig6(w1(0) + w1(1) * 0.0)
    def d12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val s0 = d12((p1 - 1.0) * 1.0) + d12((p0 - 0.0) * 1.0)
    val s1 = d12((p1 - 1.0) * 1.0) + d12((p0 - 0.0) * 0.0)
    assert(w2(0) == w1(0) - 0.5 * (s0.toDouble / 2))
    assert(w2(1) == w1(1) - 0.5 * (s1.toDouble / 2))
  }

  test("training separates separable data and scoring ranks it") {
    val df = (1 to 40).map(i => (i.toDouble / 40, if (i > 20) 1.0 else 0.0))
      .toDF("x1", "y")
    val w = QualityModel.trainLogistic(df, Seq("x1"), "y",
      iters = 10, lr = 1.0)
    assert(w(1) > 0.0) // positive slope learned
    val scores = df.select($"y",
        QualityModel.prob6(Seq($"x1"), w).as("p"))
      .groupBy($"y").agg(avg($"p")).as[(Double, Double)]
      .collect().toMap
    assert(scores(1.0) > scores(0.0))
  }

  test("training is deterministic under repartitioning (exact sums)") {
    val rows = (1 to 100).map(i =>
      (i.toDouble / 100, ((i * 37) % 100).toDouble / 100,
        if ((i * 7) % 3 == 0) 1.0 else 0.0))
    val a = rows.toDF("x1", "x2", "y").repartition(1)
    val b = rows.toDF("x1", "x2", "y").repartition(17)
    val wa = QualityModel.trainLogistic(a, Seq("x1", "x2"), "y", 3, 0.5)
    val wb = QualityModel.trainLogistic(b, Seq("x1", "x2"), "y", 3, 0.5)
    assert(wa.sameElements(wb)) // bit-identical, not approximately equal
  }

  test("logistic scoring is row-local: no shuffle in the plan") {
    val df = Seq((0.1, 0.2)).toDF("x1", "x2")
    val plan = df.select(QualityModel.prob6(Seq($"x1", $"x2"),
        Array(0.1, 0.2, 0.3)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("trainLogistic refuses bad hyperparameters and empty frames") {
    val df = Seq((1.0, 1.0)).toDF("x1", "y")
    intercept[IllegalArgumentException] {
      QualityModel.trainLogistic(df, Seq("x1"), "y", iters = 0, lr = 0.5)
    }
    intercept[IllegalArgumentException] {
      QualityModel.trainLogistic(df, Seq("x1"), "y", iters = 1, lr = 0.0)
    }
    intercept[IllegalArgumentException] {
      QualityModel.trainLogistic(df.limit(0), Seq("x1"), "y", 1, 0.5)
    }
  }
}
