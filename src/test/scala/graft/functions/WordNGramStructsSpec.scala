package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins graft.functions.WordNGramStructs to the zip-shifted-slices form
  * it replaced (arrays_zip of n slices of split(text, " ")), including
  * the Java-split corner cases: empty string is one empty token;
  * leading / trailing / consecutive spaces produce empty tokens that
  * participate in grams; fewer than n tokens yields the empty array. */
class WordNGramStructsSpec extends SparkSpec {
  import spark.implicits._

  /** The original arrays_zip-over-slices form (trigramBackoffScore's
    * gramRows / bigramLogProb's bg0 / textrankEdges' bg, pre-native). */
  private def zipGrams(text: Column, n: Int): Column = {
    val t = split(text, " ")
    val len = greatest(org.apache.spark.sql.functions.size(t) - (n - 1), lit(0))
    arrays_zip((1 to n).map(i => slice(t, lit(i), len).as(s"w$i")): _*)
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

  private def gramSeq(df: org.apache.spark.sql.DataFrame, col0: Column, n: Int) =
    df.select(col0.as("g")).collect().map(
      _.getSeq[org.apache.spark.sql.Row](0).map(r => (0 until n).map(r.getString)))

  for (n <- Seq(2, 3, 5)) {
    test(s"matches arrays_zip-over-slices form for n=$n") {
      val got = gramSeq(corpus, WordNGramStructs(col("text"), n), n)
      val want = gramSeq(corpus, zipGrams(col("text"), n), n)
      got should contain theSameElementsInOrderAs want
    }
  }

  test("null text yields null; explode drops it like the zip form") {
    val df = Seq[Option[String]](None, Some("a b c")).toDF("text")
    val raw = df.select(WordNGramStructs(col("text"), 2)).collect()
    assert(raw(0).isNullAt(0))
    val exploded = df.select(explode(WordNGramStructs(col("text"), 2)).as("g"))
      .select(col("g.w1"), col("g.w2")).collect()
    exploded.map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("a", "b"), ("b", "c"))
  }

  test("exploded fields join-key-equal to the zip form's") {
    val a = corpus.select(explode(WordNGramStructs(col("text"), 3)).as("g"))
      .select(col("g.w1"), col("g.w2"), col("g.w3"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val b = corpus.select(explode(zipGrams(col("text"), 3)).as("g"))
      .select(col("g.w1"), col("g.w2"), col("g.w3"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    a.toSeq should contain theSameElementsInOrderAs b.toSeq
  }

  test("participates in whole-stage codegen") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = corpus.repartition(2)
      .select(WordNGramStructs(col("text"), 2).as("g"))
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"),
      s"expected WholeStageCodegen in:\n$plan")
  }
}
