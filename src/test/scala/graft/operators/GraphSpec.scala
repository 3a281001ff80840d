package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankFixedPoint: symmetric pair is a fixed point; path graph by hand") {
    // a—b symmetric: contribution 1e6 each way, 150000 + 850000 = 1e6
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val out = Graph.pageRankFixedPoint(pair, "s", "d", iters = 5)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1000000L), (2L, 1000000L)))

    // path a—b—c, one iteration: deg a=1 b=2 c=1;
    // inflow a = 1e6/2, b = 1e6+1e6, c = 1e6/2
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("s", "d")
    val one = Graph.pageRankFixedPoint(path, "s", "d", iters = 1)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(one.toSeq == Seq(
      (1L, 150000L + 500000L * 850000L / 1000000L),
      (2L, 150000L + 2000000L * 850000L / 1000000L),
      (3L, 150000L + 500000L * 850000L / 1000000L)))
  }

  test("triangleCounts: hand-computed K4-minus-edge; canonicalization") {
    // K4 on {1,2,3,4} minus edge (1,4): triangles {1,2,3} and {2,3,4}.
    // Per-node: 1→1, 2→2, 3→2, 4→1. Edges fed as a MESS — duplicated,
    // reversed, self-loop — must canonicalize to the 5 simple edges.
    val edges = Seq(
      (1L, 2L), (2L, 1L), // dup orientation
      (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 3L), // self-loop dropped
      (4L, 2L)  // dup of (2,4)
    ).toDF("s", "d")
    val out = Graph.triangleCounts(edges, "s", "d")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("triangleCounts: triangle-free graph returns zeros for all nodes") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "d")
    val out = Graph.triangleCounts(star, "s", "d")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)))
  }

  test("triangleCounts: numeric-string ids work; non-numeric refuse loudly") {
    // Numeric strings cast cleanly — same answer as the long form.
    val ok = Seq(("1", "2"), ("2", "3"), ("1", "3")).toDF("s", "d")
    val out = Graph.triangleCounts(ok, "s", "d")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // A non-numeric id must fail the job, not silently null out of the
    // a < b filter and return an empty frame.
    val bad = Seq(("1", "2"), ("node-7", "2")).toDF("s", "d")
    val ex = intercept[Exception] {
      Graph.triangleCounts(bad, "s", "d").collect()
    }
    def msg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" "))
    assert(msg(ex).contains("non-numeric vertex id"))
  }

  test("pageRankFixedPoint refuses dangling nodes loudly") {
    val dangling = Seq((1L, 2L)).toDF("s", "d") // 2 never a source
    val ex = intercept[Exception] {
      Graph.pageRankFixedPoint(dangling, "s", "d", iters = 1).collect()
    }
    assert(ex.getMessage.contains("has no out-edges") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("has no out-edges"))
  }
}
