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

  test("native VecDot is bit-identical to the declarative HOF fold") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "a", "b")
    val diff = data.select(
        VF.dot($"a", $"b").as("native"),
        VF.hofDot($"a", $"b").as("hof"))
      .filter($"native" =!= $"hof") // exact double equality, no tolerance
      .count()
    assert(diff == 0)
  }

  test("VecDot rejects non-double-array inputs at analysis") {
    import org.apache.spark.sql.GraftBridge
    val bad = GraftBridge.column(VecDot(
      GraftBridge.expression($"id"), GraftBridge.expression($"id")))
    val ex = intercept[Exception] {
      Seq(1L).toDF("id").select(bad).collect()
    }
    assert(ex.getMessage.contains("vec_dot"))
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
