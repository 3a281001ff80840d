package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the per-row 64-bit SimHash — the
  * stateless-projection form the STREAMING near-dup operators need
  * (the batch artifact path aggregates votes over an exploded token
  * index instead, which is the right shape when a shuffle by doc id is
  * happening anyway).
  *
  * Why custom (SURVEY §7.3 preference order): the declarative per-row
  * form folds a 64-element vote array through `aggregate`/`zip_with`
  * HOFs — CodegenFallback, interpreted lambda dispatch per (token,
  * bit), and the token hash is re-evaluated once per BIT inside the
  * array constructor: 64 xxhash64 calls per token. This expression
  * hashes each distinct token once and runs the vote loop in compiled
  * code.
  *
  * Semantics are bit-identical to the declarative form and to the
  * aggregate artifact path (spec-asserted token-for-token): lowercase,
  * split on a single space keeping empties (`split(lower(s), " ", -1)`
  * — the same `UTF8String.toLowerCase`/`split` entry points Spark's
  * `Lower`/`StringSplit` call), first-occurrence distinct by binary
  * equality, one `xxhash64` (seed 42, Spark's default) vote of ±1 per
  * bit, sign of the vote sum per output bit. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val Space = UTF8String.fromString(" ")

  /** The expression's whole semantics, callable from generated code. */
  def compute(s: UTF8String): Long = {
    val toks = s.toLowerCase.split(Space, -1)
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val h = XXH64.hashUTF8String(t, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }
}
