package graft.proc

import graft.SparkSpec

class RegistrySpec extends SparkSpec {

  test("registered procedure runs and returns status protocol") {
    Registry.register("sp_test_count", (s, p) => {
      import s.implicits._
      val n = Seq(1, 2, 3).toDF("x").count()
      Registry.StatusResult(1, n)
    })
    val r = Registry.call("sp_test_count", spark)
    assert(r.status == 1 && r.rows == 3)
  }

  test("unknown procedure and throwing procedure map to -1, not exceptions") {
    assert(Registry.call("sp_missing", spark).status == -1)
    Registry.register("sp_boom", (_, _) => throw new RuntimeException("x"))
    val r = Registry.call("sp_boom", spark)
    assert(r.status == -1 && r.error == "x")
  }

  test("comma-joined multi-value params split like the reference SPs") {
    val p = Map("geo_limit" -> "Canada,Ontario", "category" -> "food", "empty" -> "")
    assert(Registry.multiValue(p, "geo_limit") == Seq("Canada", "Ontario"))
    assert(Registry.multiValue(p, "category") == Seq("food"))
    assert(Registry.multiValue(p, "empty").isEmpty)
    assert(Registry.multiValue(p, "absent").isEmpty)
  }
}
