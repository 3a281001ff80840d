package graft.tools

import scala.collection.mutable.ListBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S13: warehouse DDL bootstrap — replay a `.sql` script into the session
  * catalog.
  *
  * Reference behavior: uploading a `.sql` file triggers an ECS task that
  * replays it statement-by-statement (`;`-delimited) against the fresh
  * database (`2.1 leader-lambda-for-mysql.py:185-276`, `rds_init`
  * container task). The Spark-native equivalent is a driver-side replay
  * into the catalog: `CREATE DATABASE / TABLE / VIEW`, `INSERT`, etc. —
  * each statement one `spark.sql` call. Control-plane work: O(statements)
  * driver calls; any data-movement statements inside the script run as
  * ordinary distributed jobs.
  *
  * Script dialect: ANSI/Spark SQL. Line comments (`--`) and block
  * comments (slash-star) are stripped; statements split on `;` — both
  * QUOTE-AWARE, so literals containing `;`, `--`, or quote characters
  * replay intact.
  * MySQL stored-procedure bodies (the reference's sibling-repo `.sql`)
  * have no Spark equivalent — their capabilities are the engine's native
  * operators, registered behind [[graft.proc.Registry]] instead.
  */
object InitJob {

  final case class StatementResult(index: Int, sql: String, error: Option[String])
  final case class InitResult(results: Seq[StatementResult]) {
    def ok: Boolean = results.forall(_.error.isEmpty)
    def failed: Seq[StatementResult] = results.filter(_.error.nonEmpty)
  }

  /** Replay `scriptPath` (any Hadoop FileSystem URI). With
    * `continueOnError=false` (default, mirroring the reference's fail-
    * fast init task) the first failing statement aborts the replay; the
    * returned results still carry every executed statement. */
  def run(spark: SparkSession, scriptPath: String,
          continueOnError: Boolean = false): InitResult = {
    val results = ListBuffer.empty[StatementResult]
    val stmts = statements(readScript(spark, scriptPath))
    var aborted = false
    stmts.zipWithIndex.foreach { case (sql, i) =>
      if (!aborted) {
        val err =
          try { spark.sql(sql).collect(); None }
          catch { case e: Exception =>
            Some(Option(e.getMessage).getOrElse(e.toString)) }
        results += StatementResult(i, sql, err)
        if (err.nonEmpty && !continueOnError) aborted = true
      }
    }
    InitResult(results.toSeq)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: InitJob <script.sql> [database]")
    val spark = SparkSession.builder()
      .appName("graft-init")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    if (args.length > 1) spark.sql(s"USE ${args(1)}")
    val res = run(spark, args(0))
    res.results.foreach { r =>
      val status = r.error.map(e => s"FAILED: $e").getOrElse("ok")
      println(s"[init] stmt ${r.index}: $status")
    }
    if (!res.ok) sys.exit(1)
  }

  private def readScript(spark: SparkSession, scriptPath: String): String = {
    val p = new Path(scriptPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Split a script into statements: one linear scan tracking quote
    * state ('…' and "…" with backslash escapes, backtick identifiers)
    * so `;`, `--`, or a block-comment opener inside a literal never
    * terminates or comments out a statement. */
  private[tools] def statements(script: String): Seq[String] = {
    val out = ListBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var quote: Char = 0 // 0 = outside any literal; else the closing char
    val n = script.length
    while (i < n) {
      val c = script.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == '\\' && quote != '`' && i + 1 < n) { // escape inside '…'/"…"
          cur.append(script.charAt(i + 1)); i += 1
        } else if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; cur.append(c); i += 1
      } else if (c == '-' && i + 1 < n && script.charAt(i + 1) == '-') {
        while (i < n && script.charAt(i) != '\n') i += 1 // line comment
      } else if (c == '/' && i + 1 < n && script.charAt(i + 1) == '*') {
        i += 2 // block comment
        while (i + 1 < n &&
          !(script.charAt(i) == '*' && script.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
        cur.append(' ') // keep token separation across the comment
      } else if (c == ';') {
        val s = cur.toString.trim
        if (s.nonEmpty) out += s
        cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.toSeq
  }
}
