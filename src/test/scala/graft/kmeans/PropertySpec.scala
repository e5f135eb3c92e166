package graft.kmeans

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Property-style invariants (seeded random fixtures) from SURVEY §5c:
  * assignment is argmin-invariant under centroid permutation, means stay
  * in the members' convex hull, displacement is 0 iff centroid sets are
  * equal, and re-centering is partition-count invariant (the correct
  * (sum,count) partial-agg semantics — the reference's combiner trap). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randPoints(n: Int) =
    Seq.fill(n)((rnd.nextDouble() * 100, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
  private def randCents(k: Int) =
    Seq.fill(k)(Point(rnd.nextDouble() * 100, rnd.nextDouble() * 100, rnd.nextDouble() * 100))

  test("assignment is invariant under centroid permutation (indices remapped)") {
    val pts = randPoints(300).toDF("x", "y", "z")
    val cents = randCents(5)
    val perm = rnd.shuffle(cents.indices.toList)
    val permuted = perm.map(cents(_)) // permuted(j) = cents(perm(j))
    val orig = Assign.assign(pts, cents)
      .select("x", "y", "z", "cluster").as[(Double, Double, Double, Int)]
      .collect().map(r => (r._1, r._2, r._3) -> r._4).toMap
    val remap = Assign.assign(pts, permuted)
      .select("x", "y", "z", "cluster").as[(Double, Double, Double, Int)]
      .collect()
    remap.foreach { case (x, y, z, c2) =>
      perm(c2) shouldBe orig((x, y, z))
    }
  }

  test("re-centered means lie in the members' per-axis convex hull") {
    val pts = randPoints(500).toDF("x", "y", "z")
    val cents = randCents(4)
    val assigned = Assign.assign(pts, cents).cache()
    val bounds = assigned.groupBy("cluster")
      .agg(org.apache.spark.sql.functions.min("x"), org.apache.spark.sql.functions.max("x"),
        org.apache.spark.sql.functions.min("y"), org.apache.spark.sql.functions.max("y"),
        org.apache.spark.sql.functions.min("z"), org.apache.spark.sql.functions.max("z"))
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    Recenter.recenter(assigned).collect().foreach { r =>
      val (xl, xh, yl, yh, zl, zh) = bounds(r.getInt(0))
      r.getDouble(1) should (be >= xl and be <= xh)
      r.getDouble(2) should (be >= yl and be <= yh)
      r.getDouble(3) should (be >= zl and be <= zh)
    }
  }

  test("displacement is 0 iff centroid sequences are equal") {
    val c = randCents(5)
    KMeansRunner.displacement(c, c) shouldBe 0.0
    val moved = c.updated(2, Point(c(2).x + 1e-6, c(2).y, c(2).z))
    KMeansRunner.displacement(c, moved) should be > 0.0
  }

  test("re-centering is partition-count invariant (correct partial-agg semantics)") {
    val pts = randPoints(1000).toDF("x", "y", "z")
    val cents = randCents(5)
    val one = KMeansRunner.step(pts.coalesce(1), cents)
    val many = KMeansRunner.step(pts.repartition(7), cents)
    one.map(_._1) shouldBe many.map(_._1)
    one.zip(many).foreach { case ((_, a), (_, b)) =>
      math.abs(a.x - b.x) should be <= 1e-9 * math.max(1.0, math.abs(a.x))
      math.abs(a.y - b.y) should be <= 1e-9 * math.max(1.0, math.abs(a.y))
      math.abs(a.z - b.z) should be <= 1e-9 * math.max(1.0, math.abs(a.z))
    }
  }

  test("jaccard pair mining is partition-count invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p1 = graft.llm.Dedup.jaccardPairs(docs.coalesce(1), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p8 = graft.llm.Dedup.jaccardPairs(docs.repartition(8), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    p1 shouldBe p8
  }

  test("wide simhash signatures are partition-count AND row-order invariant") {
    // the per-bit majority votes are exact integer counts, so no
    // partitioning or row order can flip a signature bit
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Dedup.simhashWide(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val base = sigs(docs.coalesce(1))
    sigs(docs.repartition(8)) shouldBe base
    sigs(docs.orderBy(col("doc_id").desc)) shouldBe base
    base.values.toSet.size should be > 1
  }

  test("chunk dedup family is partition-count AND row-order invariant") {
    // keeper choice is min(struct(doc_id, chunk_id)) — a total order no
    // partitioning can perturb; reassembly sorts by chunk_id
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def dd(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.chunkDedup(df, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val base = dd(docs.coalesce(1))
    dd(docs.repartition(8)) shouldBe base
    dd(docs.orderBy(col("doc_id").desc)) shouldBe base
    def bp(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.dropBoilerplateChunks(df, 10, 2)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    bp(docs.repartition(8)) shouldBe bp(docs.coalesce(1))
  }

  test("token-budget mixture is partition-count AND row-order invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def kept(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.tokenBudgetSample(df, Map.empty, 500L)
        .filter(col("kept")).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val base = kept(docs.coalesce(1))
    kept(docs.repartition(8)) shouldBe base
    kept(docs.orderBy(col("doc_id").desc)) shouldBe base
    base should not be empty
    // the pre-trimmed twin shares the invariance AND the kept set: the
    // bucket bound is content-keyed (fp), so no layout can move it
    def keptT(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.tokenBudgetSampleTrimmed(df, Map.empty, 500L)
        .filter(col("kept")).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    keptT(docs.repartition(8)) shouldBe base
    keptT(docs.orderBy(col("doc_id").desc)) shouldBe base
  }

  test("novelty and bigram-LM scores are partition-count invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // novelty: compare ALL columns — counts AND the rounded score
    def nov(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.novelty(df)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    val nBase = nov(docs.coalesce(1))
    val nRep = nov(docs.repartition(8))
    nRep.keySet shouldBe nBase.keySet
    for (k <- nBase.keySet) withClue(s"doc $k: ") {
      nRep(k)._1 shouldBe nBase(k)._1
      nRep(k)._2 shouldBe nBase(k)._2
      (nRep(k)._3.isNaN && nBase(k)._3.isNaN) || nRep(k)._3 == nBase(k)._3 shouldBe true
    }
    // bigram-LM: per-doc float sum order varies with partitioning but
    // the round-4 grid must absorb it (the unigram/tfidf argument)
    def lp(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.bigramLogProb(df, 0.9)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val a = lp(docs.coalesce(1)); val b = lp(docs.repartition(8))
    a.keySet shouldBe b.keySet
    for (k <- a.keySet)
      withClue(s"doc $k: ") {
        (a(k).isNaN && b(k).isNaN) || a(k) == b(k) shouldBe true
      }
  }

  test("round-10 scorers are partition-count invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // quality classifier: exact-integer grid — MUST be bitwise stable
    def qc(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.qualityClassifier(df)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    qc(docs.repartition(8)) shouldBe qc(docs.coalesce(1))
    // trigram backoff: per-doc float sum order varies with layout but
    // the round-4 grid must absorb it (the bigram argument)
    def tg(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.trigramBackoffScore(
        df, df.filter(col("doc_id") % 2 === 0))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val a = tg(docs.coalesce(1)); val b = tg(docs.repartition(8))
    a.keySet shouldBe b.keySet
    for (k <- a.keySet) withClue(s"doc $k: ") {
      (a(k).isNaN && b(k).isNaN) || a(k) == b(k) shouldBe true
    }
    // temperature sample: content-keyed thresholds — layout-free
    def ts(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.temperatureSample(df)
        .filter(col("keep")).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    ts(docs.repartition(8)) shouldBe ts(docs.coalesce(1))
  }

  test("round-11 operators are partition-count invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // quantile gate: exact-grid scores + total (score, doc_id) order ->
    // identical ranks under any layout
    def qq(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.qualityQuantileFilter(df, 0.3)
        .collect().map(r => (r.getLong(0),
          (r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    qq(docs.repartition(8)) shouldBe qq(docs.coalesce(1))
    // bloom dedup: integer hashes + exact verification — layout-free
    def bd(df: org.apache.spark.sql.DataFrame) = {
      val batch = df.filter(col("doc_id") % 5 === 0)
      val corpus = df.filter(col("doc_id") % 5 =!= 0)
      graft.llm.Dedup.bloomDedup(batch, corpus, 1000L, 8000L)
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    }
    bd(docs.repartition(8)) shouldBe bd(docs.coalesce(1))
    // BPE trainer: integer pair counts under a total argmax order; the
    // merge table and the per-doc segmentation must not move
    def bpe(df: org.apache.spark.sql.DataFrame) = (
      graft.llm.TextAnalysis.bpeTrain(df, 4)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq,
      graft.llm.TextAnalysis.bpeEncode(df, 4)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap)
    bpe(docs.repartition(8)) shouldBe bpe(docs.coalesce(1))
    // trigram LID: integer counts/ranks/penalties over total orders
    def lid(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.langIdTrigram(df, 64, 32)
        .collect().map(r => (r.getLong(0),
          (if (r.isNullAt(2)) null else r.getString(2),
            if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    lid(docs.repartition(8)) shouldBe lid(docs.coalesce(1))
  }

  test("heavy-hitter sketch flags are partition-count invariant (mergeable CMS)") {
    // count-min cells are exact integer sums, so partition-wise build +
    // merge equals the single-partition build — estimates can't drift
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def hh(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.heavyHitters(df, 5, 0.001, 0.99, 42)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toSeq
    hh(docs.repartition(8)) shouldBe hh(docs.coalesce(1))
  }

  test("sketched heavy hitters are partition-count invariant at ample capacity") {
    // outside the eviction regime (capacity >= per-partition distinct
    // tokens) the Misra-Gries candidate set is the full local vocabulary
    // under ANY layout, and CMS estimates are layout-invariant integer
    // sums — so the top-k must not move across partitionings
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def hhs(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.heavyHittersSketched(df, 5, 65536, 0.001, 0.99, 42)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    hhs(docs.repartition(8)) shouldBe hhs(docs.coalesce(1))
  }

  test("deterministic sampling is partition-count AND row-order invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def ids(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.deterministicSample(df, 20)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val base = ids(docs.coalesce(1))
    ids(docs.repartition(8)) shouldBe base
    ids(docs.orderBy(col("doc_id").desc)) shouldBe base
    base should not be empty
  }

  test("tf-idf top terms are partition-count invariant (rounded-grid ranking)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def top(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.tfidfTopTerms(df, 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4), r.getLong(5))).toSet
    top(docs.coalesce(1)) shouldBe top(docs.repartition(8))
  }

  test("substring pair mining is partition-count invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Dedup.substringPairs(df, 12, 16L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = pairs(docs.coalesce(1))
    pairs(docs.repartition(8)) shouldBe base
    base should not be empty
  }

  test("bm25 ranking is partition-count invariant (rounded-grid scores)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def top(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.bm25TopDocs(df, Seq("spark", "window"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    top(docs.coalesce(1)) shouldBe top(docs.repartition(8))
  }

  test("round-14 operators are partition-count invariant") {
    import org.apache.spark.sql.DataFrame
    val spark0 = spark
    import spark0.implicits._
    // event debounce: the kept set is a pure function of (key, time, id)
    val ev = graft.SparkEntry.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("tus"))
    def kept(df: DataFrame) =
      graft.analytics.Analytics.debounceEvents(df, 86400L * 1000000L)
        .collect().map(_.getLong(0)).toSet
    val k1 = kept(ev.coalesce(1))
    kept(ev.repartition(8)) shouldBe k1
    k1 should not be empty
    // SCD2 merge + log backfill: integer versions, null-safe compares —
    // output row sets independent of input layout
    val hist = Seq((1L, "a", 0L, Option.empty[Long], true),
      (2L, "b", 0L, Option.empty[Long], true))
      .toDF("key", "seg", "valid_from", "valid_to", "is_current")
    val chg = (1L to 100L).map(k => (k, s"s${k % 7}")).toDF("key", "seg")
    def merged(h: DataFrame, c: DataFrame) =
      graft.ops.ScdMerge.merge(h, c, "key", Seq("seg"), 5L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    merged(hist.repartition(8), chg.repartition(8)) shouldBe
      merged(hist.coalesce(1), chg.coalesce(1))
    val log = (1L to 60L).flatMap(k =>
      (0L to (k % 4)).map(v => (k, s"s${(k + v) % 3}", v)))
      .toDF("key", "seg", "v")
    def hist2(df: DataFrame) =
      graft.ops.ScdMerge.fromChangeLog(df, "key", Seq("seg"), "v")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    hist2(log.repartition(8)) shouldBe hist2(log.coalesce(1))
    // bursting terms: exact integer counts and one exact-grid division
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def bursts(df: DataFrame) = {
      val out = graft.llm.TextAnalysis.burstTerms(df, 50L, 4L, 1L)
      val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(6)) Double.NaN else r.getDouble(6))).toSet
      out.unpersist(false)
      rows
    }
    val b1 = bursts(docs.coalesce(1))
    bursts(docs.repartition(8)) shouldBe b1
    b1 should not be empty
  }
}
