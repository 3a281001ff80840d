package graft.pipeline

import graft.SparkSpec
import graft.operators.Upsert
import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

/** VERDICT r11 #1: the e2e gate flaked because the table depended on
  * which of two concurrent loads merged LAST. These tests pin the fix —
  * version-resolved (commutative) merges — at both grains:
  *
  *  - the merge operator: any order, any interleaving, any redelivery
  *    of the same batches lands one table;
  *  - the pipeline: the exact flake scenario, deterministically — file
  *    A transiently fails stage 2, file C (newer) lands, A's retry
  *    merges AFTER C — and C's values must still win.
  */
class MergeStressSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  test("mergeVersioned: commutative, idempotent, stale-proof") {
    val t = Seq(("A", 1L, 10.0, 100L), ("A", 2L, 20.0, 100L),
      ("B", 3L, 30.0, 100L)).toDF("part", "k", "v", "ver")
    val u1 = Seq(("A", 1L, 11.0, 200L), ("B", 9L, 90.0, 200L))
      .toDF("part", "k", "v", "ver")
    val u2 = Seq(("A", 1L, 12.0, 300L), ("A", 2L, 22.0, 300L))
      .toDF("part", "k", "v", "ver")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("part", "k", "v", "ver")
        .as[(String, Long, Double, Long)].collect().toSet
    val keys = Seq("part", "k")
    val fwd = rows(Upsert.mergeVersioned(
      Upsert.mergeVersioned(t, u1, keys, "ver"), u2, keys, "ver"))
    val rev = rows(Upsert.mergeVersioned(
      Upsert.mergeVersioned(t, u2, keys, "ver"), u1, keys, "ver"))
    assert(fwd == rev)
    assert(fwd == Set(("A", 1L, 12.0, 300L), ("A", 2L, 22.0, 300L),
      ("B", 3L, 30.0, 100L), ("B", 9L, 90.0, 200L)))
    // redelivery of an already-merged batch is a no-op
    assert(rows(Upsert.mergeVersioned(
      Upsert.mergeVersioned(t, u1, keys, "ver"), u1, keys, "ver")) ==
      rows(Upsert.mergeVersioned(t, u1, keys, "ver")))
    // a STALE batch (version below the table's) never regresses a key
    val stale = Seq(("A", 1L, 1.0, 50L)).toDF("part", "k", "v", "ver")
    assert(rows(Upsert.mergeVersioned(t, stale, keys, "ver")) == rows(t))
  }

  test("mergeIntoPartitioned: 20 random merge orders land one table") {
    val batches = Seq(
      Seq(("A", 1L, 10.0, 1L), ("A", 2L, 20.0, 1L), ("B", 3L, 30.0, 1L)),
      Seq(("A", 1L, 11.0, 2L), ("B", 9L, 90.0, 2L)),
      Seq(("A", 2L, 22.0, 3L), ("C", 4L, 40.0, 3L)),
      Seq(("B", 3L, 33.0, 4L))
    ).map(_.toDF("part", "k", "v", "ver"))
    val expected = Set(
      ("A", 1L, 11.0), ("A", 2L, 22.0), ("B", 3L, 33.0),
      ("B", 9L, 90.0), ("C", 4L, 40.0))
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { i =>
      val table = tmpDir(s"graft_stress$i").resolve("t").toString
      rnd.shuffle(batches).foreach { b =>
        Upsert.mergeIntoPartitioned(spark, table, b,
          Seq("part", "k"), "part", "ver")
      }
      val got = spark.read.parquet(table)
        .select("part", "k", "v").as[(String, Long, Double)].collect().toSet
      assert(got == expected, s"iteration $i diverged: $got")
    }
  }

  private val header =
    "Date,GEO,DGUID,Products,UOM,UOM_ID,SCALAR_FACTOR,SCALAR_ID,VECTOR,COORDINATE,VALUE,STATUS,SYMBOL,TERMINATED,DECIMALS"
  private def row(date: String, geo: String, v: String) =
    s"$date,$geo,2016A0001,All-items,Units,300,units,0,v1,1.1,$v,,,,1"
  private def writeCsv(dir: Path, name: String, lines: Seq[String],
                       mtime: Long): String = {
    val f = dir.resolve(name)
    Files.writeString(f, lines.mkString("\n"))
    Files.setLastModifiedTime(f, FileTime.fromMillis(mtime))
    f.toString
  }

  test("pipeline: A's late retry cannot overwrite C's newer values") {
    // the r11 flake, made deterministic: A fails stage 2 (transient),
    // C (written later, larger mtime) loads and updates the shared key,
    // then A's RETRY succeeds — merging after C. Under last-merge-wins
    // A's older value resurfaced; under mergeVersioned C must win.
    val in = tmpDir("graft_flake"); val wh = tmpDir("graft_flake_wh")
    val p = new IngestPipeline(spark, wh.toString, maxErrors = 0)
    val t0 = System.currentTimeMillis() - 60000
    // A: one corrupt row -> reconcile fails with maxErrors=0
    val a = writeCsv(in, "priceindex_a.csv", Seq(header,
      row("1995-11", "Canada", "101.5"), "garbage,row"), t0)
    assert(p.load(a).status == 0)
    val c = writeCsv(in, "priceindex_c.csv", Seq(header,
      row("1995-11", "Canada", "202.5")), t0 + 5000)
    assert(p.load(c).status == 1)
    // the transient corruption clears; A keeps its original mtime
    writeCsv(in, "priceindex_a.csv", Seq(header,
      row("1995-11", "Canada", "101.5")), t0)
    assert(p.load(a).status == 1)
    val v = p.permanent().filter($"GEO" === "Canada")
      .select("VALUE").as[java.math.BigDecimal].head()
    assert(v.doubleValue() == 202.5,
      s"stale A overwrote newer C: got $v")
  }

  test("pipeline: concurrent A/C loads land the C-wins answer") {
    (1 to 3).foreach { i =>
      val in = tmpDir(s"graft_conc$i"); val wh = tmpDir(s"graft_conc_wh$i")
      val p = new IngestPipeline(spark, wh.toString)
      val t0 = System.currentTimeMillis() - 60000
      val a = writeCsv(in, "priceindex_a.csv", Seq(header,
        row("1995-11", "Canada", "101.5"),
        row("1995-11", "Ontario", "103.0")), t0)
      val c = writeCsv(in, "priceindex_c.csv", Seq(header,
        row("1995-11", "Canada", "202.5")), t0 + 5000)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fa = pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = p.load(a).status
        })
        val fc = pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = p.load(c).status
        })
        assert(fa.get() == 1 && fc.get() == 1)
      } finally pool.shutdown()
      val got = p.permanent().select("GEO", "VALUE")
        .as[(String, java.math.BigDecimal)].collect()
        .map { case (g, v) => (g, v.doubleValue()) }.toSet
      assert(got == Set(("Canada", 202.5), ("Ontario", 103.0)),
        s"iteration $i diverged: $got")
    }
  }
}
