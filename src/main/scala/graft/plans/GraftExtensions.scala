package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0,
  * (acc, v) -> acc + v)` — into the native codegen'd [[DotProduct]]
  * expression.
  *
  * HOFs evaluate their lambda per element through the interpreter and
  * never enter whole-stage codegen (~40× slower on the embedding
  * workload, see DotProduct's scaladoc). Users writing the idiomatic
  * DataFrame formulation get the fused primitive loop automatically;
  * the rewrite is semantics-preserving because DotProduct reproduces
  * the HOF chain's behavior exactly — left-to-right accumulation AND
  * the null cases (null array, length mismatch, null element all yield
  * null, as zip_with's null padding does in the fold). The zero literal
  * must be bit-exact +0.0: an empty-array fold returns the init literal
  * itself.
  *
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder.withExtensions`).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  /** The body multiplies exactly the two lambda variables (either order). */
  private def isElementProduct(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable,
        y: NamedLambdaVariable, _), Seq(a: NamedLambdaVariable,
        b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  /** The merge adds exactly the accumulator and element vars. */
  private def isSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable,
        _), Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  /** The finish lambda is the identity on its single argument. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable),
        _) => v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(l, r, mul: LambdaFunction),
          Literal(zero: Double, DoubleType), merge: LambdaFunction, finish)
          // raw-bits check: -0.0 == 0.0 but an empty-array fold returns
          // the init literal itself, and -0.0 is not bit-identical to
          // DotProduct's +0.0
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            isDoubleArray(l) && isDoubleArray(r) &&
            isElementProduct(mul) && isSum(merge) && isIdentity(finish) =>
        DotProduct(l, r)
    }
}

/** Session-extension entry point (SURVEY §4's extension ladder, step c):
  * injects graft's optimizer rules AND SQL functions into any
  * SparkSession via `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * `graft_dot(a, b)` exposes the codegen'd [[DotProduct]] to pure-SQL
  * users — `spark.sql("SELECT graft_dot(qv, cv) ...")` gets the same
  * fused primitive loop the DataFrame API gets, with no HOF lambda
  * interpretation and no UDF registration per session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"graft_dot expects 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
  }
}
