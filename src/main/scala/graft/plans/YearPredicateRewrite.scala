package graft.plans

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite function-wrapped temporal predicates
  * into pushable ranges on the bare column — `year(col) = Y` (plus the
  * inequality and IN forms) into half-open year ranges, and
  * `CAST(col AS DATE) = 'd'` into a one-day timestamp range.
  *
  * Why it matters at scale: a function-wrapped column (`year(ts) = 1996`)
  * cannot be pushed to the parquet scan — every row group is read and the
  * predicate evaluated per row. The equivalent range predicate on the
  * bare column pushes down (`PushedFilters: [GreaterThanOrEqual(...),
  * LessThan(...)]`), enabling min/max row-group skipping and partition
  * pruning — on a date-partitioned 100 TB fact table this is the
  * difference between scanning one year and scanning everything.
  * `Reports.priceByPeriodGeoCategory` applies this rewrite by hand; the
  * rule does it for every query in the session, including ad-hoc SQL.
  * The predicate shape comes from the reference's report procedure
  * parameters — one year at a time (`year=1995`,
  * `sp_reporting_1_price_by_year_month_geo_category`,
  * `2.2 loading-lambda-for-mysql.py:416-447`).
  *
  * Semantics are identical, including nulls (`year(null) = Y` is null;
  * a range comparison on null is null) and the ±290-million-year range
  * of representable timestamps (no overflow at any Int year the analyzer
  * accepts). Only equality is rewritten: `year(a) <op> Y` for
  * inequalities is equally expressible but equality is the shape the
  * reference emits (its report procedures filter one year at a time).
  *
  * Install on an existing session (no restart):
  * {{{ spark.experimental.extraOptimizations ++= Seq(YearPredicateRewrite) }}}
  * or session-wide via config:
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object YearPredicateRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // equality: the full half-open year range
      case e @ EqualTo(Year(c), Literal(y: Int, IntegerType)) =>
        rangeFor(c, y).getOrElse(e)
      case e @ EqualTo(Literal(y: Int, IntegerType), Year(c)) =>
        rangeFor(c, y).getOrElse(e)
      // inequalities: one range endpoint each. year(a) >= Y ⟺ a >= Y-01-01,
      // year(a) > Y ⟺ a >= (Y+1)-01-01, and duals; literal-first forms
      // flip the comparison.
      case e @ GreaterThanOrEqual(Year(c), Literal(y: Int, IntegerType)) =>
        boundFor(c, y, lower = true).getOrElse(e)
      case e @ GreaterThan(Year(c), Literal(y: Int, IntegerType)) =>
        boundFor(c, y + 1, lower = true).getOrElse(e)
      case e @ LessThan(Year(c), Literal(y: Int, IntegerType)) =>
        boundFor(c, y, lower = false).getOrElse(e)
      case e @ LessThanOrEqual(Year(c), Literal(y: Int, IntegerType)) =>
        boundFor(c, y + 1, lower = false).getOrElse(e)
      case e @ GreaterThanOrEqual(Literal(y: Int, IntegerType), Year(c)) =>
        boundFor(c, y + 1, lower = false).getOrElse(e) // year <= Y
      case e @ GreaterThan(Literal(y: Int, IntegerType), Year(c)) =>
        boundFor(c, y, lower = false).getOrElse(e) // year < Y
      case e @ LessThan(Literal(y: Int, IntegerType), Year(c)) =>
        boundFor(c, y + 1, lower = true).getOrElse(e) // year > Y
      case e @ LessThanOrEqual(Literal(y: Int, IntegerType), Year(c)) =>
        boundFor(c, y, lower = true).getOrElse(e) // year >= Y
      // day equality: `CAST(ts AS DATE) = 'd'` — the "one day of logs"
      // shape — becomes a one-day timestamp range on the bare column
      case e @ EqualTo(Cast(ts, DateType, _, _), Literal(d: Int, DateType))
          if ts.dataType == TimestampNTZType && saneDay(d) =>
        dayRange(ts, d)
      case e @ EqualTo(Literal(d: Int, DateType), Cast(ts, DateType, _, _))
          if ts.dataType == TimestampNTZType && saneDay(d) =>
        dayRange(ts, d)
      // membership: OR of per-year ranges (each prunes independently;
      // parquet pushes disjunctions of ranges)
      case e @ In(Year(c), list)
          if list.nonEmpty && list.forall {
            case Literal(_: Int, IntegerType) => true; case _ => false
          } =>
        val ranges = list.collect { case Literal(y: Int, IntegerType) =>
          rangeFor(c, y)
        }
        if (ranges.forall(_.isDefined)) ranges.flatten.reduce(Or) else e
    }

  /** Build `base >= start && base < end` for the year, unwrapping the
    * implicit timestamp→date cast the analyzer inserts under `year()` so
    * the comparison lands on the raw scan column. TIMESTAMP_NTZ and DATE
    * only: a zoned TIMESTAMP's year depends on the session timezone, and
    * a rule must not bake one zone's boundary in. */
  // years far outside the calendar range would overflow the literal
  // constructors (and never appear in real predicates) — leave them alone
  private def sane(y: Int): Boolean = y > -99999 && y < 99999

  private def rangeFor(child: Expression, y: Int): Option[Expression] = {
    if (!sane(y)) return None
    val (base, loLit, hiLit) = child match {
      case Cast(ts, DateType, _, _) if ts.dataType == TimestampNTZType =>
        (ts, ntzLiteral(y), ntzLiteral(y + 1))
      case d if d.dataType == DateType =>
        (d, dateLiteral(y), dateLiteral(y + 1))
      case _ => return None
    }
    Some(And(GreaterThanOrEqual(base, loLit), LessThan(base, hiLit)))
  }

  /** Single-sided year bound: `base >= Y-01-01` (lower) or
    * `base < Y-01-01` (upper). */
  private def boundFor(child: Expression, y: Int,
                       lower: Boolean): Option[Expression] = {
    if (!sane(y)) return None
    val (base, lit) = child match {
      case Cast(ts, DateType, _, _) if ts.dataType == TimestampNTZType =>
        (ts, ntzLiteral(y))
      case d if d.dataType == DateType =>
        (d, dateLiteral(y))
      case _ => return None
    }
    Some(if (lower) GreaterThanOrEqual(base, lit) else LessThan(base, lit))
  }

  // within the DATE type's calendar range (±~10k years of epoch): the
  // day→micros conversion cannot overflow a Long
  private def saneDay(d: Int): Boolean = math.abs(d) <= 3_650_000

  private def dayRange(ts: Expression, epochDay: Int): Expression = {
    val lo = epochDay * 86400000000L
    And(GreaterThanOrEqual(ts, Literal(lo, TimestampNTZType)),
      LessThan(ts, Literal(lo + 86400000000L, TimestampNTZType)))
  }

  private def ntzLiteral(year: Int): Literal = {
    val micros = LocalDateTime.of(year, 1, 1, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    Literal(micros, TimestampNTZType)
  }

  private def dateLiteral(year: Int): Literal = {
    val days = ChronoUnit.DAYS.between(
      java.time.LocalDate.ofEpochDay(0), java.time.LocalDate.of(year, 1, 1))
    Literal(days.toInt, DateType)
  }
}

/** `spark.sql.extensions` entry point registering the engine's Catalyst
  * rules on session build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => YearPredicateRewrite)
}

/** Convenience installer for an already-running session. */
object GraftExtensions {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(YearPredicateRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ YearPredicateRewrite
}
