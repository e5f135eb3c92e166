package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins graft.functions.WordNGrams to the higher-order-function form it
  * replaced (transform/sequence/element_at over split(text, " "), with
  * array_distinct for the distinct variant), including the Java-split
  * corner cases: empty string is one empty token; leading / trailing /
  * consecutive spaces produce empty tokens that participate in grams. */
class WordNGramsSpec extends SparkSpec {
  import spark.implicits._

  /** The original HOF form (Dedup.shingles / ngramShingles pre-native). */
  private def hofGrams(text: Column, n: Int, distinct: Boolean): Column = {
    val toks = split(text, " ")
    val nToks = org.apache.spark.sql.functions.size(toks)
    val raw = transform(sequence(lit(1), nToks - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))
    val grams = if (distinct) array_distinct(raw) else raw
    when(nToks >= n, grams).otherwise(array().cast("array<string>"))
  }

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a",
    "one",
    "",
    " ",
    "  double  spaces  inside  ",
    "trailing space ",
    " leading space",
    "exactly two",
    "unicode café naïve 中文 tokens café naïve",
    "x y x y x y x y",
    "tab\tis one token here"
  ).toDF("text")

  for (n <- Seq(1, 2, 3, 5); d <- Seq(true, false)) {
    test(s"matches HOF form for n=$n distinct=$d") {
      val got = corpus.select(WordNGrams(col("text"), n, d).as("g")).collect().map(_.getSeq[String](0))
      val want = corpus.select(hofGrams(col("text"), n, d).as("g")).collect().map(_.getSeq[String](0))
      got should contain theSameElementsInOrderAs want
    }
  }

  test("null text yields null; Dedup.shingles coalesces it to empty") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    val raw = df.select(WordNGrams(col("text"), 2, distinct = true)).collect()
    assert(raw(0).isNullAt(0))
    val viaDedup = df.select(graft.llm.Dedup.shingles(col("text")).as("s"))
      .collect().map(_.getSeq[String](0))
    viaDedup(0) shouldBe Seq.empty
    viaDedup(1) shouldBe Seq("a b")
  }

  test("distinct keeps first-occurrence order like array_distinct") {
    val out = Seq("b a b a c a b").toDF("text")
      .select(WordNGrams(col("text"), 2, distinct = true).as("g"))
      .collect()(0).getSeq[String](0)
    out shouldBe Seq("b a", "a b", "a c", "c a")
  }

  test("non-distinct is positional: element i is the gram at token position i") {
    val out = Seq("p q p q").toDF("text")
      .select(WordNGrams(col("text"), 2, distinct = false).as("g"))
      .collect()(0).getSeq[String](0)
    out shouldBe Seq("p q", "q p", "p q")
  }

  test("participates in whole-stage codegen") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = corpus.repartition(2)
      .select(WordNGrams(col("text"), 2, distinct = true).as("g"))
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"),
      s"expected WholeStageCodegen in:\n$plan")
  }
}
