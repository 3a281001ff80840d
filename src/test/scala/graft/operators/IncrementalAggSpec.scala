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

  test("applyChangesMulti: two measures in one state; a retraction " +
      "that retires an extremum repairs from the base (runner-up " +
      "recovered); an add re-covering the extremum stays clean — view " +
      "equals a from-scratch rebuild") {
    def feed(t: (String, Double, Double, String)*) =
      t.toSeq.toDF("k", "v", "w", "_change_type")
    val cols = Seq("v", "w")
    val base0 = Seq(("a", 1.0, 10.0), ("a", 3.0, 30.0), ("a", 2.0, 20.0),
      ("b", 5.0, 50.0)).toDF("k", "v", "w")
    val st0 = IncrementalAgg.multiState(base0, keys, cols)
    // a: delete its max v (3.0) — retirement, the runner-up (2.0) is
    //    unrecoverable from subtractable state; the same batch's
    //    insert carries a new max w (99.0), so w stays clean via the
    //    add-dominates guard
    // b: update 5->8 — the retraction ties the old max but the add
    //    re-covers it
    val f = feed(
      ("a", 3.0, 30.0, "delete"),
      ("a", 1.5, 99.0, "insert"),
      ("b", 5.0, 50.0, "update_preimage"),
      ("b", 8.0, 80.0, "update_postimage"))
    val finalFacts = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0),
      ("a", 1.5, 99.0), ("b", 8.0, 80.0)).toDF("k", "v", "w")
    val st1 = IncrementalAgg.applyChangesMulti(st0, keys, cols, f,
      finalFacts)
    val got = IncrementalAgg.reportMulti(st1, keys, cols)
      .collect().toSet
    val want = IncrementalAgg.reportMulti(
      IncrementalAgg.multiState(finalFacts, keys, cols), keys, cols)
      .collect().toSet
    assert(got == want)
    // the repaired max v for a must be the RUNNER-UP, not the retired 3
    val aRow = IncrementalAgg.reportMulti(st1, keys, cols)
      .filter($"k" === "a").select($"max_v", $"min_w")
      .as[(Double, Double)].head()
    assert(aRow == ((2.0, 10.0)))
    // shape guard refuses a non-multiState left side
    val ex = intercept[IllegalArgumentException] {
      IncrementalAgg.applyChangesMulti(base0, keys, cols, f, finalFacts)
    }
    assert(ex.getMessage.contains("multiState"))
  }

  test("applyChangesMulti: a coalesced batch that adds AND retracts a " +
      "value past the old extremum repairs — it must not trust the " +
      "dead add (telescoped update-then-delete across intervals)") {
    val cols = Seq("v")
    def feed1(t: (String, Double, String)*) =
      t.toSeq.toDF("k", "v", "_change_type")
    val st0 = IncrementalAgg.multiState(
      Seq(("a", 10.0), ("a", 2.0)).toDF("k", "v"), keys, cols)
    // one key: updated 10 -> 1500 (interval 1) then DELETED (interval
    // 2), coalesced into one micro-batch — the add of 1500 is dead on
    // arrival; a state-only tie test would certify max = 1500
    val batch = feed1(("a", 10.0, "update_preimage"),
      ("a", 1500.0, "update_postimage"), ("a", 1500.0, "delete"))
    val finalFacts = Seq(("a", 2.0)).toDF("k", "v")
    val st1 = IncrementalAgg.applyChangesMulti(st0, keys, cols, batch,
      finalFacts)
    val got = IncrementalAgg.reportMulti(st1, keys, cols)
      .select($"k", $"n", $"min_v", $"max_v")
      .as[(String, Long, Double, Double)].head()
    assert(got == (("a", 1L, 2.0, 2.0)))
  }

  test("applyChangesMulti: fully-retracted groups drop; successive " +
      "folds stay type-stable and equal the combined rebuild") {
    def feed(t: (String, Double, Double, String)*) =
      t.toSeq.toDF("k", "v", "w", "_change_type")
    val cols = Seq("v", "w")
    val st0 = IncrementalAgg.multiState(
      Seq(("a", 1.0, 10.0), ("b", 5.0, 50.0)).toDF("k", "v", "w"),
      keys, cols)
    val f1 = feed(("b", 5.0, 50.0, "delete"),
      ("c", 7.0, 70.0, "insert"))
    val facts1 = Seq(("a", 1.0, 10.0), ("c", 7.0, 70.0)).toDF("k", "v", "w")
    val st1 = IncrementalAgg.applyChangesMulti(st0, keys, cols, f1, facts1)
    val f2 = feed(("a", 1.0, 10.0, "update_preimage"),
      ("a", 4.0, 40.0, "update_postimage"))
    val facts2 = Seq(("a", 4.0, 40.0), ("c", 7.0, 70.0)).toDF("k", "v", "w")
    val st2 = IncrementalAgg.applyChangesMulti(st1, keys, cols, f2, facts2)
    // names/types (incl. decimal precisions) must not drift
    // fold-to-fold — a versioned state dir depends on it (nullability
    // normalizes through parquet, so only (name, type) is contractual)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.map(f => (f.name, f.dataType))
    assert(shape(st0) == shape(st1) && shape(st1) == shape(st2))
    val got = IncrementalAgg.reportMulti(st2, keys, cols).collect().toSet
    val want = IncrementalAgg.reportMulti(
      IncrementalAgg.multiState(facts2, keys, cols), keys, cols)
      .collect().toSet
    assert(got == want)
    assert(got.map(_.getString(0)) == Set("a", "c")) // b dropped
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
