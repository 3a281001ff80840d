package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Jaro-Winkler similarity — the fuzzy-entity-match
  * scorer the blocked matcher ([[graft.operators.Dedup.fuzzyNamePairs]]
  * family) applies per candidate pair. Spark has `levenshtein` but no
  * Jaro-Winkler; a HOF formulation would need per-character lambda
  * dispatch over a position product, so this is the custom-Expression
  * case of SURVEY §7.3's preference order.
  *
  * Semantics are the textbook algorithm, bit-compatible with DuckDB's
  * `jaro_winkler_similarity` (the oracle engine, verified on the
  * classic MARTHA/MARHTA=0.961̄, DIXON/DICKSONX=0.813̄ vectors plus
  * empty/boost-threshold/long-prefix edges):
  *  - operates on UTF-8 BYTES (so does DuckDB — 'café' vs 'cafe'
  *    scores as lengths 5/4), match window = max(len)/2 − 1;
  *  - transpositions = half the out-of-order matched positions;
  *  - either side empty → 0.0 (including both);
  *  - Winkler prefix boost (p=0.1, prefix capped at 4 bytes) applied
  *    only when jaro > 0.7.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires string inputs, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The expression's whole semantics, callable from generated code. */
  def compute(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.getBytes; val b = s2.getBytes
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val range = math.max(math.max(la, lb) / 2 - 1, 0)
    val aFlags = new Array[Boolean](la)
    val bFlags = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + range)
      var j = math.max(0, i - range)
      var found = false
      while (j <= hi && !found) {
        if (!bFlags(j) && b(j) == a(i)) {
          aFlags(i) = true; bFlags(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var halfT = 0; var k = 0
    i = 0
    while (i < la) {
      if (aFlags(i)) {
        while (!bFlags(k)) k += 1
        if (a(i) != b(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val t = halfT / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPref = math.min(4, math.min(la, lb))
    while (l < maxPref && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
