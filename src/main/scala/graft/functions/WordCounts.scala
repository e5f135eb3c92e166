package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Within-document word n-gram counts of a space-separated text column
  * in one native pass: `array<struct<term, tf>>` over the DISTINCT
  * word `n`-grams in first-occurrence order, `tf` = occurrence count
  * (n = 1: plain tokens).
  *
  * Why it exists (r20): a document's tokens all live in ONE row, so
  * per-(doc, term) counts are a per-row computation — yet the postings
  * and tf builders computed them as `explode(grams)` + a corpus-wide
  * `groupBy(doc_id, term)` hash aggregate, whose partial/final
  * aggregation over the exploded stream was the measured cost center
  * of every lex-store lifecycle line (7-16 stage-CPU-s per
  * 1/3-corpus batch at sf0.1, vs 0.2-0.8 for the explode itself).
  * `explode(WordCounts(text, n))` emits the same (term, tf) rows with
  * NO shuffle aggregate at all — (doc_id, term) is unique by
  * construction.
  *
  * Exact-integer equivalence with the aggregate form is pinned by
  * WordCountsSpec (same multiset of (doc, term, tf) rows; split
  * limit=-1 corner cases included: `""` is one empty token, runs of
  * spaces produce empty tokens that count; fewer than n tokens yields
  * the empty array, exactly like WordNGrams). Same one-boundary-scan /
  * zero-copy-gram-slice discipline as [[WordNGrams]]. */
case class WordCounts(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_word_counts: need n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_counts requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = WordCounts.OutType
  override def prettyName: String = "graft_word_counts"

  override def nullSafeEval(input: Any): Any =
    WordCounts.counts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordCounts.counts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordCounts =
    copy(child = newChild)
}

object WordCounts {

  val OutType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Shared by interpreted eval and generated code. */
  def counts(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token boundaries (the WordNGrams walk: a space is one byte in
    // UTF-8 and never part of a multi-byte sequence)
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
    // first-occurrence-ordered gram counts; documents are ~10^2 tokens,
    // so a small linked hash map per row is the whole state. A gram of
    // n consecutive tokens is the contiguous byte range from the first
    // token's start to the last one's end (zero-copy slice).
    val nGrams = t - n + 1
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](nGrams * 2)
    var g = 0
    while (g < nGrams) {
      val off = starts(g)
      val gram = UTF8String.fromBytes(bytes, off, ends(g + n - 1) - off)
      val slot = m.get(gram)
      if (slot == null) m.put(gram, Array(1L)) else slot(0) += 1L
      g += 1
    }
    val out = new Array[Any](m.size)
    k = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(c: Column, n: Int = 1): Column =
    ColumnBridge.column(new WordCounts(ColumnBridge.expression(c), n))
}
