package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (`array<float>`).
  *
  * The dot product — the innermost loop of every similarity/dedup
  * operator — is a native Catalyst expression with `doGenCode`
  * ([[VecDot]]); the declarative HOF form (`aggregate(zip_with(...))`)
  * is CodegenFallback and pays interpreted lambda dispatch per element.
  * `hofDot` keeps the declarative formulation for cross-checking.
  *
  * All arithmetic is promoted to double up front: the fold over the array
  * is sequential in array order, so results are bit-deterministic and
  * reproducible by the DuckDB oracle (same element order, same promotion).
  */
object VectorFunctions {

  import org.apache.spark.sql.GraftBridge.{column => c, expression => e}

  def dot(a: Column, b: Column): Column =
    c(VecDot(e(a.cast("array<double>")), e(b.cast("array<double>"))))

  /** Declarative reference implementation of `dot` (bit-identical). */
  def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded to 6 dp — the canonical comparison form: double
    * addition is non-associative, so engines may differ in the last bits;
    * 6 dp is far above that noise while far below any ranking tie. */
  def cosineRounded(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
