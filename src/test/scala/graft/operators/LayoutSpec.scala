package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmpDir =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("zValue interleaves bits (x even positions, y odd)") {
    // x=0b101 (5), y=0b011 (3) -> z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 3)).as[Long].head()
    assert(z == 27L)
    // identity checks: zValue(x, 0) spreads x to even bits, (0, y) to odd
    val zx = Seq((7L, 0L)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 3)).as[Long].head()
    assert(zx == 21L) // 0b010101
    val zy = Seq((0L, 7L)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 3)).as[Long].head()
    assert(zy == 42L) // 0b101010
  }

  test("zValue is monotone over nested quadrants (curve locality)") {
    // all points of the lower-left quadrant sort before any point of the
    // upper-right quadrant — the property that makes z-ranges tiles
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y))
      .toDF("x", "y")
    val z = grid.select($"x", $"y", Layout.zValue($"x", $"y", 4).as("z"))
      .as[(Long, Long, Long)].collect()
    val lowerLeft = z.collect { case (x, y, v) if x < 8 && y < 8 => v }
    val upperRight = z.collect { case (x, y, v) if x >= 8 && y >= 8 => v }
    assert(lowerLeft.max < upperRight.min)
  }

  test("z-ordered layout prunes a y-only predicate; x-sorted cannot") {
    // 64x64 grid, 16 files. A predicate on y alone is the adversarial
    // case for an x-sorted layout: every file spans the full y range.
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val zPath = s"$tmpDir/layout_z"
    val xPath = s"$tmpDir/layout_x"
    Layout.writeZOrdered(grid, zPath, "x", "y", numFiles = 16, bits = 6)
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xPath)

    val zEnv = Layout.fileEnvelopes(spark, zPath, "x", "y")
    val xEnv = Layout.fileEnvelopes(spark, xPath, "x", "y")
    assert(zEnv.count() == 16 && xEnv.count() == 16)

    // y in [0, 7] — 1/8 of the plane
    val zRead = Layout.filesIntersectingBox(zEnv, 0L, 63L, 0L, 7L)
    val xRead = Layout.filesIntersectingBox(xEnv, 0L, 63L, 0L, 7L)
    assert(xRead == 16, s"x-sorted layout should read everything, read $xRead")
    assert(zRead <= 8, s"z-ordered layout should skip most files, read $zRead")

    // a small 2-d box prunes even harder
    val zBox = Layout.filesIntersectingBox(zEnv, 0L, 15L, 0L, 15L)
    assert(zBox <= 4, s"z-ordered 1/16 box should touch few files, read $zBox")

    // layout changes bytes on disk, never content
    assert(spark.read.parquet(zPath).as[(Long, Long)].collect().toSet ==
      grid.as[(Long, Long)].collect().toSet)
  }

  test("hilbertValue is a bijective unit-step curve matching the reference") {
    // enumerate the full 16x16 grid: the column output must equal the
    // driver reference, cover [0, 256) exactly once, and consecutive
    // curve positions must be Manhattan-adjacent (the locality property
    // Morton lacks — its quadrant seams jump across the plane)
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y))
      .toDF("x", "y")
    val got = grid
      .select($"x", $"y", Layout.hilbertValue($"x", $"y", 4).as("h"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == graft.functions.HilbertValue.xy2d(4, x, y))
    }
    val byD = got.map { case (x, y, h) => h -> (x, y) }.toMap
    assert(byD.keySet == (0L until 256L).toSet)
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps between d=$d and ${d + 1}")
    }
  }

  test("hilbertValue is a scan-stage projection — no exchange, no fallback") {
    // via parquet: a local relation would be constant-folded into a
    // LocalTableScan at plan time, hiding the scan-stage shape
    val src = s"$tmpDir/hilbert_plan_src"
    (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y").write.mode("overwrite").parquet(src)
    val out = spark.read.parquet(src)
      .select($"x", Layout.hilbertValue($"x", $"y", 5).as("h"))
    out.collect()
    val planTree = out.queryExecution.executedPlan
    val plan = planTree.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    // the `*(n)` prefix marks operators fused into a codegen stage
    assert(planTree.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, s"hilbert key must stay inside codegen:\n$plan")
  }

  test("hilbert layout prunes a y-only predicate at least as well as z-order") {
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val hPath = s"$tmpDir/layout_h"
    Layout.writeHilbert(grid, hPath, "x", "y", numFiles = 16, bits = 6)
    val hEnv = Layout.fileEnvelopes(spark, hPath, "x", "y")
    assert(hEnv.count() == 16)
    val hRead = Layout.filesIntersectingBox(hEnv, 0L, 63L, 0L, 7L)
    assert(hRead <= 8, s"hilbert layout should skip most files, read $hRead")
    val hBox = Layout.filesIntersectingBox(hEnv, 0L, 15L, 0L, 15L)
    assert(hBox <= 4, s"hilbert 1/16 box should touch few files, read $hBox")
    assert(spark.read.parquet(hPath).as[(Long, Long)].collect().toSet ==
      grid.as[(Long, Long)].collect().toSet)
  }

  test("zValue rejects out-of-range bit widths") {
    intercept[IllegalArgumentException] {
      Layout.zValue($"x", $"y", 0)
    }
    intercept[IllegalArgumentException] {
      Layout.zValue($"x", $"y", 32)
    }
  }
}
