package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (hash-groupBy), word-bigram Jaccard via
  * shingle-bucket join, MinHash+LSH banding, and SimHash — designed so no
  * path ever enumerates all document pairs:
  *
  *   - exact: one shuffle keyed by content
  *   - jaccard: pairs are generated ONLY for documents sharing a shingle
  *     (inverted-index join), then scored by intersection counts
  *   - minhash: pairs are generated ONLY within LSH band buckets, then
  *     verified with the true Jaccard — at 100 TB this is the path: the
  *     band join touches candidate pairs, never the n² space
  *   - simhash: per-document 20-bit signature, one scan
  *
  * All arithmetic is integer (polynomial hashes mod FpMod, min over
  * longs, bit tests), so the DuckDB oracle mirrors match exactly.
  */
object Dedup {
  import TextAnalysis.FpMod

  /** Distinct word-bigram shingles; documents with < 2 tokens get an
    * empty set (the sequence() guard avoids Spark's descending-sequence
    * surprise when size-1 < 1). */
  def shingles(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= 2,
      array_distinct(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Rolling polynomial hash of one shingle string (exact BIGINT). */
  def shingleHash(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(substr(s, i, lit(1)))),
      lit(0L),
      (acc, c) => (acc * 31 + c) % FpMod)

  // ---------- exact ----------

  /** One row per distinct text: content digest, the id kept by the
    * dedup policy (lowest), and the number of copies collapsed. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select(md5(col("text").cast("binary")).as("text_md5"), col("keep_id"), col("n_copies"))

  // ---------- n-gram Jaccard (inverted-index join) ----------

  /** Near-duplicate pairs (da < db) with word-bigram Jaccard >= threshold.
    * Join is on shingle (inverted index), so only co-occurring documents
    * ever pair up; jaccard = |A∩B| / (|A|+|B|−|A∩B|) from exact integer
    * counts. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(shingles(col("text"))).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("na"), col("da") === col("na.doc_id"))
      .join(sizes.as("nb"), col("db") === col("nb.doc_id"))
      .select(col("da"), col("db"),
        (col("i") / (col("na.n") + col("nb.n") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------- MinHash + LSH ----------

  /** Fixed (a, b) constants of the 16 affine min-hash functions
    * h_j(x) = (a_j * x + b_j) mod FpMod. Part of the contract. */
  val HashAB: Seq[(Long, Long)] = Seq(
    (1007L, 3L), (2003L, 17L), (3001L, 29L), (4001L, 43L),
    (5003L, 59L), (6007L, 71L), (7001L, 89L), (8009L, 101L),
    (9001L, 113L), (10007L, 131L), (11003L, 149L), (12007L, 163L),
    (13001L, 179L), (14009L, 193L), (15013L, 211L), (16001L, 227L))

  /** LSH layout: 8 bands x 2 rows — near-certain recall at jaccard>=0.5
    * band-collision probability, and deterministic either way because the
    * oracle runs the identical banding. */
  val Bands = 8
  val RowsPerBand = 2

  /** (doc_id, shingle-set, 16-element min-hash signature); docs with no
    * shingles are dropped (nothing to hash, cannot near-dup). */
  def signatures(docs: DataFrame): DataFrame = {
    val hs = transform(shingles(col("text")), shingleHash(_))
    val sig = array(HashAB.map { case (a, b) =>
      array_min(transform(hs, h => (lit(a) * h + lit(b)) % FpMod))
    }: _*)
    docs.select(col("doc_id"), shingles(col("text")).as("sh"), sig.as("sig"))
      .filter(size(col("sh")) > 0)
  }

  /** Candidate pairs from band-bucket collisions, verified with the true
    * Jaccard over the shingle sets; returns (da, db, jaccard) with
    * jaccard >= threshold. */
  def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sigs = signatures(docs).cache()
    try {
      val bands = sigs.select(col("doc_id"), col("sh"),
        posexplode(array((0 until Bands).map { b =>
          concat_ws(",", (0 until RowsPerBand).map(r =>
            element_at(col("sig"), b * RowsPerBand + r + 1)): _*)
        }: _*)).as(Seq("band", "key")))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      val sets = sigs.select(col("doc_id"), col("sh"))
      val i = size(array_intersect(col("sa"), col("sb")))
      cand
        .join(sets.select(col("doc_id").as("da"), col("sh").as("sa")), Seq("da"))
        .join(sets.select(col("doc_id").as("db"), col("sh").as("sb")), Seq("db"))
        .select(col("da"), col("db"),
          (i / (size(col("sa")) + size(col("sb")) - i)).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    } finally sigs.unpersist()
  }

  // ---------- SimHash ----------

  /** 20-bit SimHash over the shingle hashes: bit i of the signature is
    * set when at least half the shingle hashes have bit i set. */
  def simhash(docs: DataFrame): DataFrame = {
    val hs = transform(shingles(col("text")), shingleHash(_))
    val n = size(hs)
    val bits = (0 until 20).map { bit =>
      when(lit(2) * size(filter(hs, h => shiftright(h, bit).bitwiseAND(1) === 1)) >= n,
        lit(1L << bit)).otherwise(lit(0L))
    }
    docs.select(col("doc_id"),
      when(n > 0, bits.reduce(_ + _)).otherwise(lit(0L)).as("simhash"))
  }
}
