package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.DotProductExpr

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product —
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * — into the native codegen kernel [[DotProductExpr]]. The HOF form is
  * what users naturally write (and what VectorOps.dotHof keeps as the
  * reference); it evaluates interpreted, per-element. The kernel is a
  * compiled loop with identical left-fold semantics, so the rewrite is
  * result-invariant (KernelPropertySpec asserts bit-equality) — INCLUDING
  * the edge cases: ragged arrays (zip_with pads with nulls → the HOF
  * yields null; the rewrite guards with size(a)=size(b) and yields null
  * otherwise) and null elements (the kernel null-propagates when the
  * schema admits element nulls).
  *
  * This is the (c)-tier extension path used where it is genuinely
  * warranted: not a new operator — Spark can already express the
  * semantics — but a plan-level acceleration users opt into via
  *   SparkSession.builder.withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.plans.GraftExtensions.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVars(e1: Expression, e2: Expression,
                     args: Seq[NamedLambdaVariable]): Boolean =
    args.length == 2 && ((e1, e2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == args.map(_.exprId).toSet
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(x, y, _), zipArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(u, v, _), mergeArgs, _),
            LambdaFunction(fin: NamedLambdaVariable, finishArgs, _))
          if isVars(x, y, zipArgs.collect { case n: NamedLambdaVariable => n }) &&
            isVars(u, v, mergeArgs.collect { case n: NamedLambdaVariable => n }) &&
            finishArgs.collect { case n: NamedLambdaVariable => n.exprId }
              .headOption.contains(fin.exprId) =>
        // ragged arrays: zip_with pads with nulls, so the HOF form yields
        // NULL on a length mismatch — mirror that, don't min-length-dot
        If(EqualTo(Size(a), Size(b)), DotProductExpr(a, b),
          Literal(null, DoubleType))
    }
}

/** Session-extension entry point (spark.sql.extensions / withExtensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
