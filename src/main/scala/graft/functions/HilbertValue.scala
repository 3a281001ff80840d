package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the Hilbert-curve index of two
  * integer columns — the second space-filling layout key next to
  * [[graft.operators.Layout.zValue]]'s Morton interleave. The Hilbert
  * curve has strictly better locality (every unit step on the curve is
  * a unit step in the plane — no Morton "seams" where the curve jumps
  * across the grid), which tightens per-file envelopes for box
  * predicates at the same file count.
  *
  * Why a custom expression (SURVEY §7.3 preference order): the standard
  * xy2d computation is a per-bit-level STATE RECURRENCE — each level's
  * (x, y) depend on the previous level's through a branch — and
  * composing it from built-in columns triples the expression tree per
  * level once CollapseProject inlines the chain (3^bits nodes at the
  * default 16 bits: a driver planning bomb). A `doGenCode` loop is ~10
  * lines of generated Java, stays inside whole-stage codegen, and
  * evaluates in O(bits).
  *
  * Algorithm: the classic per-level quadrant walk (public knowledge —
  * e.g. Wikipedia "Hilbert curve", mapping algorithms section; the
  * rotation uses the full grid width so coordinates stay in [0, 2^bits)
  * throughout — no negative intermediates, so the DuckDB oracle replays
  * the identical arithmetic with plain shifts/CASE in an unrolled CTE
  * chain). Inputs are masked to the low `bits` bits first: wider values
  * WRAP into the key space — the write stays correct (layout never
  * changes content) but wrapped values lose curve locality, the same
  * contract as `zValue`.
  */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_value requires bigint inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertValue.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      s"""
         |long $n = 1L << $bits;
         |long $x = $a & ($n - 1L);
         |long $y = $b & ($n - 1L);
         |long $d = 0L;
         |for (long $s = $n >> 1; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $n - 1L - $x; $y = $n - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)
}

object HilbertValue {
  /** Reference implementation — the exact semantics of the expression
    * (specs compare the column output against this, and the oracle SQL
    * unrolls the same per-level arithmetic). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
