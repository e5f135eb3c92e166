package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional word `n`-gram STRUCTS of a space-separated text column in
  * one native pass — the [[WordNGrams]] discipline applied to the
  * language-model gram streams that need each gram's tokens as SEPARATE
  * join keys (w1..wn), not one concatenated string.
  *
  * Semantically identical to the zip-shifted-slices form it replaces —
  * `arrays_zip(slice(t, 1, len).as("w1"), ..., slice(t, n, len).as("wn"))`
  * over `t = split(text, " ")` with `len = greatest(size(t)-(n-1), 0)` —
  * including the Java `split` limit=-1 corner cases (leading/trailing/
  * consecutive spaces produce empty tokens that participate in grams;
  * `""` is one empty token; fewer than `n` tokens yields the empty
  * array; NULL yields NULL). WordNGramStructsSpec pins equality against
  * the arrays_zip form.
  *
  * Why native: the slice form materializes the split token array plus
  * `n` sliced copies of it plus the zipped struct array — per row, n+2
  * array allocations before the structs — and the `t` subtree appears
  * n+1 times in the projection (size + n slices), which leans on
  * codegen subexpression elimination to avoid re-splitting. Here: one
  * boundary scan over the UTF-8 bytes, one UTF8String per token (each
  * a zero-copy slice of the original buffer, built once and shared by
  * the up-to-n grams referencing it), structs built directly. */
case class WordNGramStructs(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"graft_word_ngram_structs: need n >= 2, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_ngram_structs requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = WordNGramStructs.arrayType(n)
  override def prettyName: String = "graft_word_ngram_structs"

  override def nullSafeEval(input: Any): Any =
    WordNGramStructs.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGramStructs.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGramStructs =
    copy(child = newChild)
}

object WordNGramStructs {

  private val Empty = new GenericArrayData(Array.empty[Any])

  def arrayType(n: Int): ArrayType = ArrayType(
    StructType((1 to n).map(i => StructField(s"w$i", StringType, nullable = false))),
    containsNull = false)

  /** Shared by interpreted eval and generated code. */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token boundaries between single-space separators (space is one
    // byte in UTF-8 and never part of a multi-byte sequence, so byte
    // scanning is codepoint-safe — the WordNGrams walk)
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val t = spaces + 1 // split(" ", -1): empty tokens kept, "" -> [""]
    if (t < n) return Empty
    // one UTF8String per token, built once — each token is referenced
    // by up to n grams, so per-gram re-slicing would n-plicate the work
    val toks = new Array[UTF8String](t)
    var k = 0
    var start = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') {
        toks(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
        start = i + 1
      }
      i += 1
    }
    toks(k) = UTF8String.fromBytes(bytes, start, len - start)
    val nGrams = t - n + 1
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val row = new Array[Any](n)
      var j = 0
      while (j < n) { row(j) = toks(g + j); j += 1 }
      out(g) = new GenericInternalRow(row)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(new WordNGramStructs(ColumnBridge.expression(c), n))
}
