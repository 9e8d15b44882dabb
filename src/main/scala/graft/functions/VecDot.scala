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

  // NULL-faithful to the higher-order formulation this replaces (and
  // that VecDotRewrite rewrites): zip_with pads unequal lengths with
  // nulls and a null term nullifies the whole sum — so unequal-length
  // inputs or any null element must yield NULL, not a prefix dot.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.computeChecked(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("vecDotBoxed")
      s"""
        java.lang.Double $boxed = graft.functions.VecDot.computeChecked($a, $b);
        if ($boxed == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $boxed.doubleValue();
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** static so generated code can call it directly; null when the
    * lengths differ or any element is null — the exact semantics of
    * aggregate(zip_with(a, b, _*_), 0.0, _+_)
    */
  def computeChecked(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
