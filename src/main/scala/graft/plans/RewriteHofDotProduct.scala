package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule (the `injectOptimizerRule` extension point): rewrite the
  * portable HOF dot-product spelling
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  *
  * into the codegen'd [[graft.functions.DotProduct]] native expression.
  * Users (and the oracle SQL) keep writing the engine-portable HOF form;
  * the optimizer gives them the primitive-loop implementation (~2.2×,
  * measured in FunctionsSpec) automatically. Semantics are identical by
  * construction: same cast-to-double, same left-to-right multiply-add
  * order — FunctionsSpec pins bit-equality of the two paths.
  *
  * Matching is deliberately strict (exact multiply lambda, exact add
  * lambda, literal 0.0 seed, double element types) — anything else keeps
  * the builtin HOF path.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object MultiplyLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _) =>
        (x.exprId == ax.exprId && y.exprId == ay.exprId) ||
          (x.exprId == ay.exprId && y.exprId == ax.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _) =>
        (x.exprId == ax.exprId && y.exprId == ay.exprId) ||
          (x.exprId == ay.exprId && y.exprId == ax.exprId)
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(b: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        b.exprId == a.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, MultiplyLambda()),
            Literal(0.0, DoubleType) | Cast(Literal(0.0, DoubleType), DoubleType, _, _),
            AddLambda(),
            IdentityFinish())
          if isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
