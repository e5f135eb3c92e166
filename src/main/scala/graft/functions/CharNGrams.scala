package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character `n`-grams of a string column in one native pass — the
  * [[WordNGrams]] discipline applied to the char-gram family
  * (Cavnar-Trenkle LID profiles, BPE char pairs).
  *
  * Semantically identical to the higher-order-function form it
  * replaces —
  * `when(length(s) >= n, transform(sequence(1, length(s) - (n-1)),
  * i -> substr(s, i, n))).otherwise(array())` — including CODEPOINT
  * semantics: `substr` counts characters, not bytes, so the scan walks
  * UTF-8 codepoint boundaries and each gram is the byte range spanning
  * `n` codepoints (ASCII corpora take the same path with 1-byte
  * steps). A string of fewer than `n` codepoints yields the empty
  * array; NULL yields NULL (the caller's `coalesce`/`when` decides the
  * empty-vs-null contract, exactly as with the HOF form — an
  * `explode` drops both). CharNGramsSpec pins equality against the
  * HOF form on multibyte, short, empty and null inputs.
  *
  * Why native: HOFs don't participate in whole-stage codegen — the
  * interpreted lambda re-evaluates `substr` (and re-boxes the index)
  * per element, which made the trigram explode the dominant CPU cost
  * of q_lang_trigram at sf0.1 (measured r19: ~12-16 executor-CPU-s
  * per corpus pass for 1.5M trigrams). Here: one boundary scan over
  * the UTF-8 bytes, each gram a zero-copy slice of the original
  * buffer. */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_char_ngrams: need n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNGrams.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNGrams.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Shared by interpreted eval and generated code. */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // codepoint start offsets (a multi-byte sequence's continuation
    // bytes are never boundaries — numBytesForFirstByte is the same
    // stepping substr/substringSQL uses, so gram boundaries match the
    // HOF form exactly)
    var cp = 0
    var i = 0
    while (i < len) { i += UTF8String.numBytesForFirstByte(bytes(i)); cp += 1 }
    if (cp < n) return Empty
    val starts = new Array[Int](cp + 1)
    var k = 0
    i = 0
    while (i < len) {
      starts(k) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      k += 1
    }
    starts(cp) = len
    val nGrams = cp - n + 1
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      out(g) = UTF8String.fromBytes(bytes, starts(g), starts(g + n) - starts(g))
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(new CharNGrams(ColumnBridge.expression(c), n))
}
