package graft.functions

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))
  ).toDF("id", "a", "b")

  test("dot computes the inner product in double") {
    val d = vecs.select($"id", VF.dot($"a", $"b")).as[(Long, Double)]
      .collect().toMap
    assert(math.abs(d(1L) - 32.0) < 1e-9)
    assert(d(2L) == 0.0)
  }

  test("norm and cosine: orthogonal=0, parallel=1") {
    val c = vecs.select($"id", VF.cosineRounded($"a", $"b")).as[(Long, Double)]
      .collect().toMap
    assert(c(2L) == 0.0)
    assert(c(3L) == 1.0)
    assert(c(1L) > 0.97 && c(1L) < 0.98) // cos = 32/(sqrt(14)*sqrt(77))
    val n = vecs.filter($"id" === 2).select(VF.norm($"a")).as[Double].head()
    assert(n == 1.0)
  }
}
