package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class YearPredicateRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val parquetDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_year").toString
    // TIMESTAMP_NTZ like the engine's tables (parquet isAdjustedToUTC=
    // false); a zoned TIMESTAMP column takes the cast-to-date rewrite
    // branch, which cannot push
    Seq(
      (1L, ts("1995-12-31 23:59:59")),
      (2L, ts("1996-01-01 00:00:00")),
      (3L, ts("1996-07-15 12:00:00")),
      (4L, ts("1997-01-01 00:00:00"))
    ).toDF("id", "t")
      .select($"id", $"t".cast("timestamp_ntz").as("t"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("year(ts)=Y rewrites to a pushed-down half-open range") {
    GraftExtensions.install(spark)
    val df = spark.read.parquet(parquetDir).filter(year($"t") === 1996)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(t,") && plan.contains("LessThan(t,"),
      s"range not pushed to scan:\n$plan")
    assert(df.select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("without the rule the filter stays unpushed (control)") {
    // fresh check on a plan built with the rule removed
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before.filterNot(_ == YearPredicateRewrite)
    try {
      val df = spark.read.parquet(parquetDir).filter(year($"t") === 1996)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("GreaterThanOrEqual(t,"))
      assert(df.select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    } finally spark.experimental.extraOptimizations = before
  }

  test("reversed literal-first form and DATE columns also rewrite") {
    GraftExtensions.install(spark)
    val dates = Seq((1L, java.sql.Date.valueOf("1996-03-01")),
      (2L, java.sql.Date.valueOf("1997-03-01"))).toDF("id", "d")
    val out = dates.filter(lit(1996) === year($"d"))
      .select($"id").as[Long].collect()
    assert(out.toSeq == Seq(1L))
    val plan = dates.filter(lit(1996) === year($"d"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("year("), s"year() survived rewrite:\n$plan")
  }

  test("inequality year predicates rewrite to single pushed bounds") {
    GraftExtensions.install(spark)
    val df = spark.read.parquet(parquetDir)
    val cases: Seq[(org.apache.spark.sql.Column, Seq[Long])] = Seq(
      (year($"t") >= 1996, Seq(2L, 3L, 4L)),
      (year($"t") > 1996, Seq(4L)),
      (year($"t") < 1996, Seq(1L)),
      (year($"t") <= 1996, Seq(1L, 2L, 3L)),
      (lit(1996) <= year($"t"), Seq(2L, 3L, 4L)),
      (lit(1996) > year($"t"), Seq(1L)))
    cases.foreach { case (pred, expected) =>
      val got = df.filter(pred).select($"id").as[Long].collect().sorted
      assert(got.toSeq == expected, s"predicate $pred")
      val plan = df.filter(pred).queryExecution.optimizedPlan.toString
      assert(!plan.contains("year("), s"year() survived rewrite for $pred:\n$plan")
    }
  }

  test("year BETWEEN rewrites both bounds (composes from the inequality cases)") {
    GraftExtensions.install(spark)
    val df = spark.read.parquet(parquetDir)
    val q = df.filter(expr("year(t) BETWEEN 1996 AND 1996"))
    assert(q.select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("year("), s"year() survived BETWEEN rewrite:\n$opt")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(t,") && plan.contains("LessThan(t,"),
      s"BETWEEN bounds not pushed:\n$plan")
  }

  test("year IN (...) rewrites to a disjunction of ranges") {
    GraftExtensions.install(spark)
    val df = spark.read.parquet(parquetDir)
    val q = df.filter(year($"t").isin(1995, 1997))
    assert(q.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(!q.queryExecution.optimizedPlan.toString.contains("year("))
  }

  test("CAST(ts AS DATE) = 'd' rewrites to a pushed one-day range") {
    GraftExtensions.install(spark)
    val df = spark.read.parquet(parquetDir)
    val q = df.filter($"t".cast("date") === lit("1996-01-01").cast("date"))
    assert(q.select($"id").as[Long].collect().toSeq == Seq(2L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(t,") && plan.contains("LessThan(t,"),
      s"day range not pushed:\n$plan")
  }

  test("year+month conjunction rewrites to a pushed one-month range") {
    GraftExtensions.install(spark)
    val df = spark.read.parquet(parquetDir)
    // the reference's report filter shape, as the pipeline emits it
    val q = df.filter(expr("year(t) = 1996 AND month(t) = 7"))
    assert(q.select($"id").as[Long].collect().toSeq == Seq(3L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(t,") && plan.contains("LessThan(t,"),
      s"month range not pushed to scan:\n$plan")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("year(") && !opt.contains("month("),
      s"year()/month() survived rewrite:\n$opt")
    // commuted operand and literal orders rewrite too
    Seq(
      expr("month(t) = 7 AND year(t) = 1996"),
      expr("1996 = year(t) AND 7 = month(t)")
    ).foreach { p =>
      val o = df.filter(p).queryExecution.optimizedPlan.toString
      assert(!o.contains("month("), s"month() survived rewrite for $p:\n$o")
      assert(df.filter(p).select($"id").as[Long].collect().toSeq == Seq(3L))
    }
    // December rolls the upper bound into the next year
    val dec = df.filter(expr("year(t) = 1995 AND month(t) = 12"))
    assert(dec.select($"id").as[Long].collect().toSeq == Seq(1L))
  }

  test("year+month on DATE columns (the pipeline's report filter) pushes") {
    GraftExtensions.install(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_ym_date").toString
    Seq((1L, java.sql.Date.valueOf("1996-03-15")),
      (2L, java.sql.Date.valueOf("1996-04-01")),
      (3L, java.sql.Date.valueOf("1997-03-01")))
      .toDF("id", "Date").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(expr("year(Date) = 1996 AND month(Date) = 3"))
    assert(q.select($"id").as[Long].collect().toSeq == Seq(1L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(Date,") &&
      plan.contains("LessThan(Date,"), s"date month range not pushed:\n$plan")
  }

  test("month conjunction guards: different columns / bad month left alone") {
    GraftExtensions.install(spark)
    val df = Seq((1L, java.sql.Date.valueOf("1996-03-15"),
      java.sql.Date.valueOf("1996-07-01"))).toDF("id", "d1", "d2")
    // different columns: no rewrite, semantics unchanged
    val cross = df.filter(expr("year(d1) = 1996 AND month(d2) = 7"))
    assert(cross.select($"id").as[Long].collect().toSeq == Seq(1L))
    // month 13: always-false-on-non-null but null-on-null — must NOT
    // become a literal false; left unrewritten, still filters all rows
    val bad = df.filter(expr("year(d1) = 1996 AND month(d1) = 13"))
    assert(bad.queryExecution.optimizedPlan.toString.contains("month(") ||
      bad.count() == 0)
    assert(bad.count() == 0)
  }

  test("null timestamps stay excluded (null semantics preserved)") {
    GraftExtensions.install(spark)
    val df = Seq((1L, Some(ts("1996-05-05 00:00:00"))), (2L, None))
      .toDF("id", "t")
    assert(df.filter(year($"t") === 1996).select($"id").as[Long].collect()
      .toSeq == Seq(1L))
  }
}
