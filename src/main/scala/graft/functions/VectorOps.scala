package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector kernels over `array<double>` columns.
  *
  * Semantically identical to the HOF forms
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,p) -> acc+p)` /
  * `... (x-y)*(x-y) ...` for equal-length null-free arrays (same
  * left-to-right accumulation, so results are bit-identical and the
  * DuckDB oracle is unaffected) — but the HOFs evaluate a lambda per
  * element outside whole-stage codegen, which dominates pair-join ANN
  * scoring. These fuse as a tight loop in generated code.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
}

/** Σ a_i * b_i over the common prefix length. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Σ (a_i − b_i)² over the common prefix length. */
case class L2Sq(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_l2sq"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.l2sq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq =
    copy(left = l, right = r)
}

object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  def dotCol(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2sqCol(a: Column, b: Column): Column =
    ColumnBridge.column(L2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
