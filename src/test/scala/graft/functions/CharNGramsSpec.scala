package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins graft.functions.CharNGrams to the higher-order-function form it
  * replaced (transform/sequence/substr with the <n-codepoint empty
  * guard — the langIdTrigram / bpeMergeStep pre-native shape),
  * including CODEPOINT semantics on multibyte text: substr counts
  * characters, so the native boundary scan must step UTF-8 codepoints,
  * never bytes. */
class CharNGramsSpec extends SparkSpec {
  import spark.implicits._

  /** The original HOF form (langIdTrigram pre-native). */
  private def hofGrams(text: Column, n: Int): Column = {
    // qualified: bare `length` resolves to ScalaTest matcher vocabulary
    val len = org.apache.spark.sql.functions.length(text)
    when(len >= n,
      transform(sequence(lit(1), len - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  private val corpus = Seq(
    "the quick brown fox",
    "ab",
    "abc",
    "a",
    "",
    " ",
    "   ",
    "café naïve",          // 2-byte codepoints inside grams
    "中文字符串",            // 3-byte codepoints only
    "mix 中 and é chars",   // mixed widths across gram boundaries
    "aaaa",
    "tab\tand\nnewline"
  ).toDF("text")

  for (n <- Seq(1, 2, 3, 5)) {
    test(s"matches HOF substr form for n=$n (codepoint boundaries)") {
      val got = corpus.select(CharNGrams(col("text"), n).as("g"))
        .collect().map(r => Option(r.getSeq[String](0)).getOrElse(Seq.empty))
      val want = corpus.select(hofGrams(col("text"), n).as("g"))
        .collect().map(_.getSeq[String](0))
      got should contain theSameElementsInOrderAs want
    }
  }

  test("null text yields null; the call sites coalesce it to empty") {
    val df = Seq[Option[String]](None, Some("abcd")).toDF("text")
    val raw = df.select(CharNGrams(col("text"), 3)).collect()
    assert(raw(0).isNullAt(0))
    val coalesced = df.select(
      coalesce(CharNGrams(col("text"), 3), array().cast("array<string>")).as("g"))
      .collect().map(_.getSeq[String](0))
    coalesced(0) shouldBe Seq.empty
    coalesced(1) shouldBe Seq("abc", "bcd")
  }

  test("trigrams are positional and overlapping") {
    val out = Seq("abcde").toDF("text")
      .select(CharNGrams(col("text"), 3).as("g"))
      .collect()(0).getSeq[String](0)
    out shouldBe Seq("abc", "bcd", "cde")
  }

  test("participates in whole-stage codegen") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = corpus.repartition(2)
      .select(CharNGrams(col("text"), 3).as("g"))
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"),
      s"expected WholeStageCodegen in:\n$plan")
  }
}
