package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.expressions.FloatVecDot

/** Optimizer rule: rewrite the idiomatic higher-order dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0d, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[FloatVecDot]] when both arrays are
  * `array<float>`. The two formulations are bit-identical (exact float->
  * double promotion, sequential accumulation, null on null element /
  * length mismatch — zip_with's null padding nulls the sum the same way),
  * so this is a pure performance rewrite: users keep writing portable
  * higher-order code and the interpreted lambda loop disappears from hot
  * joins.
  *
  * Register with `spark.experimental.extraOptimizations :+= NativeDotRewrite`
  * or via graft.GraftExtensions.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private object DoubleOf {
    /** Matches double(x) where x is a lambda variable (with or without an
      * explicit cast — zip_with lambdas may cast either operand).
      */
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case v: NamedLambdaVariable => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(DoubleOf(x), DoubleOf(y), _), zipArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(accRef: NamedLambdaVariable, vRef: NamedLambdaVariable, _),
              Seq(accDef: NamedLambdaVariable, vDef: NamedLambdaVariable), _),
            LambdaFunction(finishBody: NamedLambdaVariable, Seq(finishArg), _))
          if isFloatArray(l) && isFloatArray(r) &&
            zipArgs.map(_.exprId).toSet == Set(x.exprId, y.exprId) && x.exprId != y.exprId &&
            accRef.exprId == accDef.exprId && vRef.exprId == vDef.exprId &&
            finishBody.exprId == finishArg.exprId =>
        FloatVecDot(l, r)
    }
}
