package graft.tools

import graft.SparkSpec
import java.nio.file.Files

class InitJobSpec extends SparkSpec {

  test("statement splitter: comments stripped, literals protected") {
    val script =
      """-- init script
        |CREATE TABLE a (x INT); /* block
        |comment */ INSERT INTO a VALUES (1);
        |INSERT INTO a VALUES (2) -- trailing note;
        |;
        |SELECT 'semi; colon -- not a comment' AS s;
        |SELECT "double; quoted" AS d
        |""".stripMargin
    val stmts = InitJob.statements(script)
    assert(stmts.size == 5)
    assert(stmts(0) == "CREATE TABLE a (x INT)")
    assert(stmts(1) == "INSERT INTO a VALUES (1)")
    assert(stmts(2) == "INSERT INTO a VALUES (2)")
    assert(stmts(3) == "SELECT 'semi; colon -- not a comment' AS s")
    assert(stmts(4) == """SELECT "double; quoted" AS d""")
  }

  test("S13: replays a DDL script into the session catalog") {
    val db = "graft_init_spec"
    val dir = Files.createTempDirectory("graft_init").toString
    val script =
      s"""-- warehouse bootstrap (reference: rds_init ECS task)
         |CREATE DATABASE IF NOT EXISTS $db;
         |CREATE TABLE IF NOT EXISTS $db.price (
         |  Date DATE, GEO STRING, VALUE DOUBLE
         |) USING parquet LOCATION '$dir/price';
         |INSERT OVERWRITE $db.price VALUES
         |  (DATE'1995-12-01', 'Canada', 104.3),
         |  (DATE'1995-12-01', 'Ontario; east', 103.9);
         |CREATE OR REPLACE VIEW $db.price_latest AS
         |  SELECT GEO, max(VALUE) AS v FROM $db.price GROUP BY GEO;
         |""".stripMargin
    val f = Files.createTempFile("init", ".sql")
    Files.writeString(f, script)
    try {
      val res = InitJob.run(spark, f.toString)
      assert(res.ok, res.failed.map(_.error).mkString("; "))
      assert(res.results.size == 4)
      assert(spark.table(s"$db.price").count() == 2)
      // the literal containing ';' survived the split
      assert(spark.table(s"$db.price").where("GEO = 'Ontario; east'").count() == 1)
      assert(spark.table(s"$db.price_latest").count() == 2)
      // replay is idempotent (IF NOT EXISTS / OR REPLACE / OVERWRITE)
      assert(InitJob.run(spark, f.toString).ok)
      assert(spark.table(s"$db.price").count() == 2)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("fail-fast: first bad statement aborts; continueOnError runs on") {
    val f = Files.createTempFile("init_bad", ".sql")
    Files.writeString(f,
      "SELECT 1; SELECT definitely_not_a_column FROM nonexistent_t; SELECT 2;")
    val strict = InitJob.run(spark, f.toString)
    assert(!strict.ok)
    assert(strict.results.size == 2) // aborted after the failure
    assert(strict.results(1).error.nonEmpty)
    val lax = InitJob.run(spark, f.toString, continueOnError = true)
    assert(lax.results.size == 3)
    assert(lax.results(2).error.isEmpty)
  }
}
