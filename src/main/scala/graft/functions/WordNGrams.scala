package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word `n`-grams of a space-separated text column in one native pass.
  *
  * Semantically identical to the higher-order-function form the module
  * started with —
  * `transform(sequence(1, size(toks) - (n-1)), i -> concat_ws(" ",
  * element_at(toks, i), ..., element_at(toks, i+n-1)))` over
  * `toks = split(text, " ")`, optionally `array_distinct`-ed, with the
  * `size(toks) >= n` guard returning an empty array — including the
  * Java `split` limit=-1 corner cases (leading/trailing/consecutive
  * spaces produce empty tokens that participate in grams; `""` is one
  * empty token). WordNGramsSpec pins equality against the HOF form.
  *
  * Why native: HOFs don't participate in whole-stage codegen, and this
  * lambda body embeds the full `split()` subtree once per
  * `element_at` — interpreted eval re-evaluates it per element, n times
  * per gram position, and CollapseProject duplicates the whole
  * expression per consuming reference (the documented env trap that
  * motivated PolyHash). At sf0.1 the HOF form made gram generation the
  * dominant CPU cost of q_substring_pairs (~90 executor-CPU-seconds
  * for 5000 docs). Here: one boundary scan over the UTF-8 bytes, each
  * gram emitted as a zero-copy slice of the original text (separators
  * are single 0x20 bytes, so a run of n tokens IS a contiguous byte
  * range), distinct via one insertion-ordered hash set — same
  * first-occurrence order as `array_distinct`.
  *
  * `distinct = false` keeps every occurrence in positional order (the
  * repetition/tf-idf/winnowing shape — winnow relies on element i being
  * the gram at token position i). */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_ngrams requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.grams(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGrams.grams($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Shared by interpreted eval and generated code. */
  def grams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token boundaries: token k spans [starts(k), ends(k)) between
    // single-space separators (space is one byte in UTF-8 and never part
    // of a multi-byte sequence, so byte scanning is codepoint-safe)
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val t = spaces + 1 // split(" ", -1): empty tokens kept, "" -> [""]
    if (t < n) return Empty
    val starts = new Array[Int](t)
    val ends = new Array[Int](t)
    var k = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(k) = i; k += 1; starts(k) = i + 1 }
      i += 1
    }
    ends(k) = len
    val nGrams = t - n + 1
    // a gram of n consecutive tokens is the contiguous byte range from
    // the first token's start to the last one's end (separators are the
    // single spaces concat_ws would re-insert)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](nGrams * 2)
      var g = 0
      while (g < nGrams) {
        val off = starts(g)
        seen.add(UTF8String.fromBytes(bytes, off, ends(g + n - 1) - off))
        g += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      val out = new Array[Any](nGrams)
      var g = 0
      while (g < nGrams) {
        val off = starts(g)
        out(g) = UTF8String.fromBytes(bytes, off, ends(g + n - 1) - off)
        g += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column-API entry point. */
  def apply(c: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(new WordNGrams(ColumnBridge.expression(c), n, distinct))
}
