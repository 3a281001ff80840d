package graft.proc

import org.apache.spark.sql.SparkSession

/** §2.10 (SURVEY): the reference's extension surface is "stored
  * procedures with OUT-params" — `call sp(...,@out); select @out;`
  * returning scalar status codes {-1,0,1} or row counts, with audit-log
  * side effects (`2.2 loading-lambda-for-mysql.py:221-230,269-280,
  * 304-319,381-398,416-431`).
  *
  * Spark mapping: a named-procedure registry of Scala functions
  * `(SparkSession, Map[String,String]) => StatusResult`. Multi-value
  * parameters arrive comma-joined exactly like the reference's SP params
  * (`R22:424` passes `geo_limit` / `category` lists as comma strings).
  */
object Registry {

  /** The reference's OUT-param protocol: status ∈ {-1 error, 0 no-op,
    * 1 success}, plus an optional scalar payload (row count). */
  final case class StatusResult(status: Int, rows: Long = 0L,
                                error: String = "")

  type Procedure = (SparkSession, Map[String, String]) => StatusResult

  private val procs =
    scala.collection.concurrent.TrieMap.empty[String, Procedure]

  def register(name: String, p: Procedure): Unit = procs.put(name, p)

  def registered: Set[String] = procs.keySet.toSet

  /** `call name(params)` — unknown procedure is the reference's -1 error
    * path, not an exception (the loader checks codes, `R22:246-251`). */
  def call(name: String, spark: SparkSession,
           params: Map[String, String] = Map.empty): StatusResult =
    procs.get(name) match {
      case Some(p) =>
        try p(spark, params)
        catch {
          case e: Exception =>
            StatusResult(-1, 0, Option(e.getMessage).getOrElse(e.toString))
        }
      case None => StatusResult(-1, 0, s"unknown procedure: $name")
    }

  /** Comma-joined multi-value param split (`R22:424-447` protocol). */
  def multiValue(params: Map[String, String], key: String): Seq[String] =
    params.get(key).filter(_.nonEmpty).map(_.split(',').toSeq)
      .getOrElse(Seq.empty)
}
