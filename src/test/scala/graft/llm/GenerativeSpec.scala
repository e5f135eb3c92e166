package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded-random generative pins for the round-10 operators whose
  * correctness arguments are the most intricate: each test draws
  * several deterministic random corpora (fixed seeds — reproducible
  * forever) and compares the distributed operator against an
  * INDEPENDENT driver-side reference implementation, so a
  * transcription slip in a column expression can't hide behind a
  * hand-picked fixture. */
class GenerativeSpec extends SparkSpec {
  import spark.implicits._

  private val Vocab: Vector[String] =
    Vector("the", "and", "of", "to", "in", "alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "kappa", "42", "007", "x9y", "moose", "wolf",
      "raven", "otter", "lynx")

  /** Deterministic corpus: `n` docs of 0..30 tokens over Vocab, a few
    * sources; token count 0 gives an empty-string text. */
  private def corpus(seed: Int, n: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val sources = Vector("web", "books", "code")
    (1L to n.toLong).map { i =>
      val len = rnd.nextInt(31)
      val text = (0 until len).map(_ => Vocab(rnd.nextInt(Vocab.size))).mkString(" ")
      (i, text, sources(rnd.nextInt(sources.size)))
    }
  }

  test("generative: trimmed token budget keeps EXACTLY the exact operator's rows") {
    for (seed <- Seq(11, 22, 33)) {
      val docs = corpus(seed, 60).toDF("doc_id", "text", "source")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
      val budgets = Map("web" -> (20L + seed))
      val exact = rows(TextAnalysis.tokenBudgetSample(docs, budgets, 50L))
      val trimmed = rows(TextAnalysis.tokenBudgetSampleTrimmed(docs, budgets, 50L))
      withClue(s"seed $seed: ") {
        trimmed.subsetOf(exact) shouldBe true
        trimmed.filter(_._5) shouldBe exact.filter(_._5)
      }
    }
  }

  test("generative: qualityClassifier matches a driver-side integer reference") {
    import TextAnalysis._
    def ref(text: String): (Long, Double, Boolean) = {
      val toks = text.split(" ", -1)
      val n = toks.length.toLong
      val a = toks.count(Stopwords.contains).toLong
      val b = toks.count(t => t.nonEmpty && t.forall(ch =>
        (ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z'))).toLong
      val c = toks.count(_.exists(ch => ch >= '0' && ch <= '9')).toLong
      val d = toks.distinct.length.toLong
      val s = toks.map(_.length.toLong).sum
      val num = QcBiasT * 1200 * n + QcStopT * 1200 * a + QcAlphaT * 1200 * b -
        QcDigitT * 1200 * c + QcDistinctT * 1200 * d +
        QcLenT * 6 * n * math.min(200L, n) - QcAvgLenT * 100 * math.min(12L * n, s)
      val score = num.toDouble / (12000L * n).toDouble
      (n, score, score >= QcThreshold)
    }
    for (seed <- Seq(5, 6)) {
      val data = corpus(seed, 50)
      val out = TextAnalysis.qualityClassifier(
        data.toDF("doc_id", "text", "source"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
      data.foreach { case (id, text, _) =>
        withClue(s"seed $seed doc $id '$text': ") {
          out(id) shouldBe ref(text) // score compared EXACTLY (same division)
        }
      }
    }
  }

  test("generative: textrank matches a driver-side integer walk bitwise") {
    import TextAnalysis.TextrankScale
    def refRank(texts: Seq[String], iters: Int): Map[String, Long] = {
      val edges = texts
        .flatMap { t => val w = t.split(" "); w.zip(w.drop(1)) }
        .filter(p => p._1 != p._2 && p._1.nonEmpty && p._2.nonEmpty)
        .flatMap(p => Seq(p, p.swap)).distinct
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      var pr: Map[String, Long] = deg.map { case (k, _) => k -> TextrankScale }
      for (_ <- 1 to iters) {
        pr = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> (15L * TextrankScale / 100 +
            85L * es.map { case (src, _) => pr(src) / deg(src) }.sum / 100)
        }
      }
      pr
    }
    for (seed <- Seq(7, 8)) {
      val data = corpus(seed, 25)
      val expected = refRank(data.map(_._2), iters = 3)
      val out = TextAnalysis.textrank(
        data.toDF("doc_id", "text", "source"), iterations = 3, k = 10000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      withClue(s"seed $seed: ") { out shouldBe expected }
    }
  }
}
