package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd bit-signature kernels for the binary (Hamming) ANN
  * path: an `array<double>` embedding collapses to `ceil(dim/32)`
  * BIGINT words of sign bits — bit `i % 32` of word `i / 32` is set iff
  * `v(i) > 0.0` (strictly: −0.0 and exact zeros clear, matching the
  * oracle's `v[i] > 0`) — and candidate distance is the XOR popcount
  * over the word arrays. 32 bits per word (never 64) so every word is a
  * small NON-NEGATIVE long: both engines assemble it as a sum of
  * distinct powers of two below 2^32, with no sign-bit overflow
  * anywhere, and the parquet round-trip is trivially exact.
  *
  * Like [[VectorOps]], these are tight generated loops inside
  * whole-stage codegen — the HOF forms (`transform`/`aggregate`) would
  * evaluate a lambda per element outside codegen and get duplicated per
  * reference by CollapseProject.
  */
case class SignBits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_sign_bits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${other.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    BitOps.signBits(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.BitOps.signBits($a)")
  override protected def withNewChildInternal(c: Expression): SignBits =
    copy(child = c)
}

/** Σ Long.bitCount(a_i ^ b_i) over the common prefix length — the
  * Hamming distance between two packed sign signatures. */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_hamming"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    BitOps.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitOps.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingWords =
    copy(left = l, right = r)
}

object BitOps {
  def signBits(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val words = new Array[Long]((n + 31) / 32)
    var i = 0
    while (i < n) {
      if (a.getDouble(i) > 0.0) words(i / 32) |= 1L << (i % 32)
      i += 1
    }
    new GenericArrayData(words)
  }

  def hamming(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  def signBitsCol(a: Column): Column =
    ColumnBridge.column(SignBits(ColumnBridge.expression(a)))
  def hammingCol(a: Column, b: Column): Column =
    ColumnBridge.column(HammingWords(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
