package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<double>`
  * vectors (SURVEY.md §2B E12/E19 — the dense-numeric kernel under
  * every cosine in the Similarity/Dedup catalogs).
  *
  * Why native: `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * interpreted (higher-order functions never enter codegen) and costs
  * ~20× more per pair; this is one tight JVM loop, and `doGenCode`
  * emits a static call so the surrounding projection stays inside
  * whole-stage codegen.
  *
  * Summation is sequential left-to-right IEEE double — the same order
  * DuckDB's `list_dot_product` uses — so oracle comparisons are
  * bit-stable, including the sign tests hyperplane LSH builds on.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<double>, array<double>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** static so generated code can call it directly; mismatched lengths
    * dot the common prefix (embeddings here are fixed-width)
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
