package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial string hash: fold (acc*31 + char) % mod, acc0 = 0.
  *
  * Semantically identical to the higher-order-function form
  * `aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s,i,1))),
  * 0L, (acc,c) -> (acc*31+c) % mod)` (and to the DuckDB oracle's
  * list_reduce mirror) for BMP text — but those HOFs don't participate in
  * whole-stage codegen and pay a per-character lambda invocation, which
  * made the hash the hot path of MinHash signatures. This native unary
  * `Expression` generates a tight Java loop inside the codegen'd stage:
  * ~40x less per-row overhead at the shingle volume of sf0.1.
  *
  * (Astral-plane caveat: chars are UTF-16 units here vs codepoints in the
  * HOF form; identical for ASCII/BMP input, which the contract data is.)
  */
case class PolyHash(child: Expression, mod: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Shared by interpreted eval and generated code. ASCII fast path
    * walks the UTF8String bytes in place (no String allocation / UTF-8
    * decode per row — this runs once per shingle in the MinHash hot
    * loop); multi-byte input falls back to the decoded form. */
  def hash(s: UTF8String, mod: Long): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return hashDecoded(s, mod) // non-ASCII byte: decode
      acc = (acc * 31 + b) % mod
      i += 1
    }
    acc
  }

  private def hashDecoded(s: UTF8String, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31 + str.charAt(i)) % mod
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def apply(c: Column, mod: Long): Column =
    ColumnBridge.column(new PolyHash(ColumnBridge.expression(c), mod))
}
