package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins graft.functions.WordCounts to the explode+groupBy form it
  * replaced in lexPostings: same multiset of (doc, term, tf) rows,
  * including the Java-split corner cases (empty string is one empty
  * token; runs of spaces produce empty tokens that count). */
class WordCountsSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox the lazy the dog"),
    (2L, "a a a a a"),
    (3L, "one"),
    (4L, ""),
    (5L, " "),
    (6L, "  double  spaces  "),
    (7L, "unicode café naïve 中文 café"),
    (8L, "tab\tstays one token")
  ).toDF("doc_id", "text")

  for (n <- Seq(1, 2, 3)) {
    test(s"matches explode+groupBy gram counts exactly for n=$n") {
      val native = corpus
        .select(col("doc_id"), explode(WordCounts(col("text"), n)).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val agg = corpus
        .select(col("doc_id"),
          explode(coalesce(WordNGrams(col("text"), n, distinct = false),
            array().cast("array<string>"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      native shouldBe agg
    }
  }

  test("terms come out in first-occurrence order with exact tf") {
    val out = Seq("b a b c a b").toDF("text")
      .select(explode(WordCounts(col("text"))).as("tc"))
      .select(col("tc.term"), col("tc.tf"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.toSeq shouldBe Seq(("b", 3L), ("a", 2L), ("c", 1L))
  }

  test("null text yields null; explode drops it") {
    val df = Seq[Option[String]](None, Some("x y")).toDF("text")
    val raw = df.select(WordCounts(col("text"))).collect()
    assert(raw(0).isNullAt(0))
    df.select(explode(WordCounts(col("text")))).count() shouldBe 2L
  }

  test("lexPostings rows unchanged by the native form (per-doc dl rides along)") {
    val rows = graft.llm.TextAnalysis.lexPostings(corpus)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val ref = corpus
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    rows shouldBe ref
  }

  test("participates in whole-stage codegen") {
    import org.apache.spark.sql.execution.ExplainMode
    val plan = corpus.repartition(2)
      .select(WordCounts(col("text")).as("tc"))
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"),
      s"expected WholeStageCodegen in:\n$plan")
  }
}
