package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding dot product.
  *
  * Why custom (SURVEY §7.3 preference order): the declarative form
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a higher-order function,
  * and Spark's HOFs are `CodegenFallback` — every row pays interpreted
  * lambda dispatch per element, and the enclosing operator falls out of
  * whole-stage codegen. A vector dot is the innermost loop of every
  * similarity/dedup operator here, so it merits the one hand-written
  * `doGenCode`: a tight primitive `double` loop, fully inside codegen.
  *
  * Semantics match the HOF formulation bit-for-bit: elementwise promote
  * to double (ImplicitCastInputTypes inserts the array<float> →
  * array<double> cast), multiply, accumulate sequentially in array order
  * (double addition is non-associative — order is part of the contract).
  * Array elements must be non-null (embedding vectors; enforced upstream).
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // AbstractDataType (and with it ImplicitCastInputTypes) is private[sql],
  // so type enforcement is manual and callers insert the array<double>
  // cast (a no-op when already double)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
