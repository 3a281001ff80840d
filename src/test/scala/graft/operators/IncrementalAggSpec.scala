package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")

  test("merge of split batches equals state over the union (associativity)") {
    val all = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0), ("a", -3.0),
      ("b", 0.5), ("c", 7.25)).toDF("k", "v")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.state(all.filter(col("v") >= 0.5), keys, "v"), keys,
      "v", all.filter(col("v") < 0.5))
    val direct = IncrementalAgg.state(all, keys, "v")
    val mr = IncrementalAgg.report(merged, keys)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    val dr = IncrementalAgg.report(direct, keys)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    assert(mr == dr)
    assert(mr.map(_._1) == Set("a", "b", "c"))
  }

  test("report derives mean/min/max from the state correctly") {
    val st = IncrementalAgg.state(
      Seq(("a", 1.0), ("a", 3.0)).toDF("k", "v"), keys, "v")
    val r = IncrementalAgg.report(st, keys)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(r.toSeq == Seq(("a", 2L, 4.0, 2.0, 1.0, 3.0)))
  }

  test("merge refuses a non-state left side loudly") {
    val notState = Seq(("a", 1.0)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      IncrementalAgg.merge(notState, keys, "v", notState)
    }
    assert(ex.getMessage.contains("mergeable columns"))
  }

  test("delta groups unseen in history appear; untouched groups persist") {
    val st0 = IncrementalAgg.state(Seq(("a", 1.0)).toDF("k", "v"), keys, "v")
    val st1 = IncrementalAgg.merge(st0, keys, "v",
      Seq(("b", 5.0)).toDF("k", "v"))
    val r = IncrementalAgg.report(st1, keys)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    assert(r == Set(("a", 1L, 1.0, 1.0, 1.0, 1.0),
      ("b", 1L, 5.0, 5.0, 5.0, 5.0)))
  }

  test("applyChanges folds a change feed into (count, sum) state: " +
      "updates retract-then-add, deletes retract, fully-retracted " +
      "groups drop, split feeds compose to the combined diff") {
    def feed(t: (String, Double, String)*) =
      t.toSeq.toDF("k", "v", "_change_type")
    // base: a = {1, 3}, b = {5}, c = {7}
    val st0 = IncrementalAgg.sumState(
      Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("c", 7.0)).toDF("k", "v"),
      keys, "v")
    // interval 1: a's 3 -> 30 (pre/post), b's 5 deleted (group drops)
    val f1 = feed(("a", 3.0, "update_preimage"),
      ("a", 30.0, "update_postimage"), ("b", 5.0, "delete"))
    // interval 2: c gains 2 (insert), a's 1 deleted
    val f2 = feed(("c", 2.0, "insert"), ("a", 1.0, "delete"))
    def rep(st: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.reportSums(st, keys)
        .as[(String, Long, Double, Double)].collect().toSet
    val st2 = IncrementalAgg.applyChanges(
      IncrementalAgg.applyChanges(st0, keys, "v", f1), keys, "v", f2)
    assert(rep(st2) == Set(("a", 1L, 30.0, 30.0),
      ("c", 2L, 9.0, 4.5)))
    // folding the concatenated feed lands the same state — interval
    // splits are invisible to the view
    val once = IncrementalAgg.applyChanges(st0, keys, "v",
      f1.unionByName(f2))
    assert(rep(once) == rep(st2))
    // and both equal a from-scratch rebuild of the final facts
    assert(rep(IncrementalAgg.sumState(
      Seq(("a", 30.0), ("c", 7.0), ("c", 2.0)).toDF("k", "v"),
      keys, "v")) == rep(st2))
    // the state-shape guard refuses a non-state left side
    intercept[IllegalArgumentException] {
      IncrementalAgg.applyChanges(Seq(("a", 1.0)).toDF("k", "v"),
        keys, "v", f1)
    }
  }
}
