package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The preference ladder for extending Spark (builder brief; SURVEY §4)
  * is built-ins > native Expression with codegen > UDF. The built-in
  * route for a dot product is `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — higher-order functions evaluate their lambda per element through the
  * interpreter, never entering whole-stage codegen, which measured ~40×
  * slower than a fused loop on the embedding workload (see
  * Similarity.cosineNearDupPairs). This expression closes that gap for
  * the Column path: doGenCode emits a primitive double loop that inlines
  * into the surrounding WholeStageCodegen stage.
  *
  * Accumulation is left-to-right, bit-identical to the HOF fold and to
  * DuckDB's list_inner_product, so oracle parity is unaffected (the
  * interpreted nullSafeEval path runs the same loop). Null semantics
  * match the HOF chain EXACTLY — required for [[graft.plans
  * .RewriteHofDotProduct]] to be a sound rewrite: null ARRAYS propagate
  * null (BinaryExpression's null-safe contract), length-MISMATCHED
  * arrays yield null (zip_with pads the shorter side with null, and the
  * null product poisons the fold), and null ELEMENTS yield null for the
  * same reason.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<double> inputs, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  // nullable even over non-null children: length mismatch / null element
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point: `dot(a, b)` over array<double> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
