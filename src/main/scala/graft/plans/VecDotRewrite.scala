package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.VecDot

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the native codegen'd [[VecDot]] kernel. Higher-order functions
  * never enter whole-stage codegen (measured ~20× per pair on dense
  * vectors), so a user who writes the textbook Catalyst formulation
  * silently pays an interpreter penalty this rule removes — same
  * values bit-for-bit (both sides are sequential left-to-right IEEE
  * summation; VecMathSpec asserts the equality).
  *
  * The match is deliberately conservative: exact double-typed shape,
  * literal 0.0 seed, single-multiply zip lambda, single-add merge
  * lambda over the bound variables, identity finish — anything else
  * is left untouched.
  *
  * Registered by GraftExtensions via `injectOptimizerRule` — the
  * SURVEY §2B E19 `Rule[LogicalPlan]` extension surface.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object DotShape {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(m1: NamedLambdaVariable,
                m2: NamedLambdaVariable, _),
                Seq(z1: NamedLambdaVariable, z2: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(s1: NamedLambdaVariable,
              s2: NamedLambdaVariable, _),
              Seq(g1: NamedLambdaVariable, g2: NamedLambdaVariable), _),
            LambdaFunction(f1: NamedLambdaVariable,
              Seq(f2: NamedLambdaVariable), _))
          if isDoubleArray(a) && isDoubleArray(b) &&
            // x * y over the two zip-bound vars, either order
            Set(m1.exprId, m2.exprId) == Set(z1.exprId, z2.exprId) &&
            // acc + v over the two merge-bound vars, either order
            Set(s1.exprId, s2.exprId) == Set(g1.exprId, g2.exprId) &&
            // identity finish
            f1.exprId == f2.exprId =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotShape(a, b) => VecDot(a, b)
    }
}
