package graft.streaming

import graft.llm.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Index-maintaining streaming LEXICAL ingest — [[VectorIndexIngest]]'s
  * discipline on the BM25 family, closing the loop
  * `TextAnalysis.writeLexIndex` opened: each arriving micro-batch lands
  * its own postings rows (term, doc_id, tf, dl — all intra-document
  * quantities, so the projection is batch-local with NO cross-batch
  * read) and a one-row stats partition; queries probe the stored rows
  * with the corpus constants SUMMED across batches (n and Σdl are
  * additive BIGINTs), bitwise the one-shot `bm25TopDocs` over the same
  * corpus (spec-pinned — the shared `bm25ScoreSlice` kernel plus exact
  * integer round-trips leave nothing to drift).
  *
  * Exactly-once is [[VectorIndexIngest]]'s: postings and stats land in
  * `ingest_batch=` partitions with dynamic overwrite; the projection is
  * deterministic per batch, so a replay rewrites exactly its original
  * partitions byte-identically — no manifest, no listing decision, no
  * prior-view read at all. Documents must be batch-disjoint (each
  * doc_id ingested once — the vec_id contract), else its df would
  * double-count.
  *
  * Long-lived stores compact with [[StoreCompaction]] — BOTH stores, and
  * the postings with `sortCols = Seq("term")`: per-batch files each span
  * the whole term range, so consolidation is exactly where the
  * row-group term locality ([[graft.llm.TextAnalysis.lexPostings]]'s
  * min/max skipping) is restored. Probes are bitwise unchanged; a
  * replayed batch at or below either watershed SKIPS. */
object LexIngest {

  def ingestBatch(batch: DataFrame, indexPath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val batchDocs = batch.select(col("doc_id"), col("text"))
    if (batchDocs.isEmpty) return
    if (batchId <= math.max(
        StoreCompaction.coveredThrough(spark, s"$indexPath/postings"),
        StoreCompaction.coveredThrough(spark, s"$indexPath/stats")))
      return // compacted replay: effects durable inside the generations
    TextAnalysis.lexPostings(batchDocs)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$indexPath/postings")
    // per-DOCUMENT stats (doc_id, dl): still additive across batches,
    // and subtractable per doc — a deletion-vector probe recomputes the
    // exact (n, Σdl) of the SURVIVING corpus, which is what keeps the
    // post-forget ranking bitwise-equal to the one-shot scorer over the
    // surviving documents
    TextAnalysis.lexDocStats(batchDocs)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$indexPath/stats")
  }

  /** Logically forget documents: postings AND stats mark the ids; every
    * [[probe]] from now on excludes them and re-derives the surviving
    * corpus constants; the next [[StoreCompaction.compact]] (with
    * `deleteIdCol = Some("doc_id")`) removes them physically. */
  def markDeleted(spark: SparkSession, indexPath: String, docIds: Seq[Long]): Unit = {
    StoreCompaction.markDeleted(spark, s"$indexPath/postings", docIds)
    StoreCompaction.markDeleted(spark, s"$indexPath/stats", docIds)
  }

  def start(docsStream: DataFrame, indexPath: String,
            checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), indexPath, batchId)
      }
      .start()

  /** BM25 top-k over the streamed store: corpus constants aggregated
    * over the LIVE per-doc stats rows (exact additive BIGINTs, deleted
    * docs subtracted), the term slice read through the live postings
    * view — the shared scoring kernel makes this bitwise
    * `bm25TopDocs`/`bm25Probe` over the surviving corpus. */
  def probe(spark: SparkSession, indexPath: String, queryTerms: Seq[String],
            k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val st = StoreCompaction.liveView(spark, s"$indexPath/stats", "doc_id")
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    TextAnalysis.bm25ScoreSlice(
      StoreCompaction.liveView(spark, s"$indexPath/postings", "doc_id"),
      queryTerms, st.getLong(0), st.getLong(1), k, k1, b)
  }
}
