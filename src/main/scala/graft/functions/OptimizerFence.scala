package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity expression that REPORTS itself nondeterministic — an
  * optimizer fence with zero runtime cost.
  *
  * Why it exists: Catalyst pushes deterministic predicates through
  * projections by SUBSTITUTING each referenced alias with its defining
  * expression. Over a chain of projections that each reference the
  * previous level several times (the config-migration rule chain:
  * `new_line`/`rules_applied` reference the prior `new_line` in guard,
  * rewrite, and change-compare), substitution multiplies at every
  * level — a single `size(rules_applied) > 0` filter pushed through a
  * 5-rule chain inflated into ~190 copies of the rule regexes, a
  * 28 KB filter condition, and a generated method past the JVM's 64 KB
  * limit (Janino compile failure + multi-second fallback churn per
  * run, observed at sf0.1). Spark has no cost guard on pushdown
  * substitution; determinism is the one contract every relevant rule
  * (PushPredicateThroughNonJoin, CollapseProject, ColumnPruning keeps
  * the alias because it IS referenced) respects.
  *
  * Wrapping a projection's output in this fence keeps predicates
  * evaluating against the projection's OUTPUT attributes — one copy of
  * the expensive expression — instead of re-deriving them from inputs.
  * The trade-off is explicit: NO predicate (even on untouched
  * passthrough columns) pushes through a fenced projection, so fence
  * only the top of an expensive chain and filter inputs BEFORE it.
  *
  * Runtime cost is literally zero: eval delegates to the child and
  * doGenCode emits the child's code verbatim, so the fenced column
  * stays inside whole-stage codegen.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the entire point of the expression: opt out of every rewrite that
  // is gated on determinism (the VALUE is deterministic — identity)
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : OptimizerFence = copy(child = newChild)
}

object OptimizerFence {
  /** Column-level fence: `fence(expensiveCol)` pins the evaluation
    * boundary at the projection that defines it.
    */
  def fence(c: Column): Column =
    ColumnBridge.column(OptimizerFence(ColumnBridge.expression(c)))
}
