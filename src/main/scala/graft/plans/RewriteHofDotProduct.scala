package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, And, ArrayAggregate, ArrayExists, Cast, EqualTo, Expression, If, IsNull, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Not, Size, ZipWith}
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
  * measured in FunctionsSpec) automatically.
  *
  * The HOF form is NULL whenever the arrays are ragged (zip_with pads the
  * shorter with nulls) or carry a null element — cases DotProduct does not
  * handle (min-length prefix, null slots read as garbage). The rewrite
  * therefore GUARDS: `If(size(a) = size(b) [AND no null elements], dot,
  * NULL)` — the else branch is exactly the HOF result in those cases, so
  * semantics are preserved for every input, not just dense ones. The
  * null-element probes are emitted only when the element type is nullable;
  * statically dense arrays pay just the two size() calls. (The else branch
  * being a literal — not the original aggregate — also keeps the rule
  * fixpoint-stable in the optimizer's fixed-point batch.)
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

  private def mayHaveNullElement(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  private def noNullElement(arr: Expression): Expression = {
    val lv = NamedLambdaVariable("el", DoubleType, nullable = true)
    Not(ArrayExists(arr, LambdaFunction(IsNull(lv), Seq(lv))))
  }

  /** The guarded rewrite: dot product when defined, NULL exactly where the
    * HOF spelling is NULL (ragged lengths / null elements / null arrays —
    * note If's condition evaluating to null also takes the else branch,
    * which covers size(NULL_ARRAY) = ... being null).
    */
  private def guarded(a: Expression, b: Expression): Expression = {
    val sameLen: Expression = EqualTo(Size(a), Size(b))
    val cond = Seq(a, b).filter(mayHaveNullElement).map(noNullElement)
      .foldLeft(sameLen)(And(_, _))
    If(cond, DotProduct(a, b), Literal(null, DoubleType))
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
        guarded(a, b)
    }
}
