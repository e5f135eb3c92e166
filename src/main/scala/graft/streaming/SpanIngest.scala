package graft.streaming

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Span-cleaning streaming ingest — [[IndexedIngest]]'s discipline
  * applied to duplicated-SPAN removal (Lee et al. 2022 at ingest time):
  * each arriving micro-batch strips every token run already present in
  * the stored corpus (`Dedup.removeCorpusSpans` against the maintained
  * gram index), then lands the CLEANED documents and the cleaned
  * text's own gram rows as per-batch partitions. The corpus converges
  * to span-disjoint content without any whole-corpus pass: a batch's
  * cost is its own grams plus a one-column scan of the stored index —
  * corpus TEXT is never read on the ingest path.
  *
  * Indexing the CLEANED text (not the raw batch) is load-bearing: the
  * index then describes exactly what the store contains, so a span can
  * never be owned by text that was itself removed. Within-batch
  * duplication is `selfClean`'s arm: the batch first runs
  * `Dedup.removeDuplicateSpans` against ITSELF (first-occurrence-owns,
  * by doc_id), then the survivor text cleans against the corpus index —
  * so a self-duplicating batch lands span-disjoint both internally and
  * against the store. The landed counts stay anchored to the RAW batch
  * (n_tokens = original tokens, n_dropped = self-dropped +
  * corpus-dropped). With selfClean = false (the default) within-batch
  * duplication passes through, per `removeCorpusSpans`' contract.
  * Documents may empty to text = '' (counts preserved); dropping them
  * is a downstream policy, not this operator's.
  *
  * Exactly-once is [[IndexedIngest]]'s on both stores: (corpus, index)
  * partitions keyed by batch id with dynamic overwrite, a batch
  * compares only against partitions written BEFORE it, so a replay
  * sees its original corpus view and rewrites its own partitions
  * byte-identically. The torn-first-batch escape and the
  * missing-index-beside-prior-batches raise are inherited verbatim.
  *
  * Long-lived stores compact with [[StoreCompaction]] — corpus and
  * index TOGETHER, to the same watershed (they describe the same
  * content). Prior-view reads go through the committed view, so a
  * compacted index serves one consolidated partition instead of one
  * per trigger; a replayed batch at or below either store's watershed
  * SKIPS (its cleaned docs and gram rows are durable inside the
  * generations). */
object SpanIngest {

  def ingestBatch(batch: DataFrame, corpusPath: String, indexPath: String,
                  batchId: Long, n: Int, selfClean: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val batchDocs = batch.select(col("doc_id"), col("text"))
    if (batchDocs.isEmpty) return
    if (batchId <= math.max(StoreCompaction.coveredThrough(spark, corpusPath),
        StoreCompaction.coveredThrough(spark, indexPath)))
      return // compacted replay: effects durable inside the generations
    val fs = new org.apache.hadoop.fs.Path(corpusPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$corpusPath/ingest_batch=*"))
    val indexDirs = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$indexPath/ingest_batch=*"))
    val priorGrams =
      if (partDirs == null || partDirs.isEmpty)
        Dedup.spanIndexRows(batchDocs.limit(0), n)
      else if (indexDirs != null && indexDirs.nonEmpty)
        StoreCompaction.committedView(spark, indexPath)
          .filter(col("ingest_batch") < batchId)
          .select(col("g"))
      else {
        // torn first batch: corpus written, index write never happened —
        // only this batch's own partitions can exist (the replay filter
        // excludes them anyway). Prior corpus batches with no index is
        // LOSS: raise, don't silently degrade to within-batch-only.
        val priorCorpusBatches = partDirs.toSeq
          .map(_.getPath.getName.stripPrefix("ingest_batch="))
          .flatMap(s => scala.util.Try(s.toLong).toOption)
          .filter(_ < batchId)
        require(priorCorpusBatches.isEmpty,
          s"span index missing at $indexPath but corpus has prior " +
            s"batches ${priorCorpusBatches.sorted.mkString(",")} — " +
            "index was lost (not a torn-first-batch replay); rebuild " +
            "it with Dedup.writeSpanIndex over the stored corpus")
        Dedup.spanIndexRows(batchDocs.limit(0), n)
      }
    // removeCorpusSpans returns its output persisted + materialized —
    // both writes below are cache reads of the one computation. With
    // selfClean the batch first strips its own internal duplicate runs,
    // then the survivor text cleans against the corpus; the landed
    // counts re-anchor to the raw batch (total tokens, total dropped)
    // via one batch-sized join of the two cached stages.
    val cleanedBase =
      if (!selfClean) Dedup.removeCorpusSpans(batchDocs, priorGrams, n)
      else {
        val sc = Dedup.removeDuplicateSpans(batchDocs, n)
        val cc = Dedup.removeCorpusSpans(
          sc.select(col("doc_id"), col("text")), priorGrams, n)
        val merged = cc
          .select(col("doc_id"), col("n_dropped").as("_cd"), col("text"))
          .join(sc.select(col("doc_id"), col("n_tokens"),
            col("n_dropped").as("_sd")), Seq("doc_id"))
          .select(col("doc_id"), col("n_tokens"),
            (col("_sd") + col("_cd")).as("n_dropped"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        merged.count()
        cc.unpersist(false)
        sc.unpersist(false)
        merged
      }
    val cleaned = cleanedBase.withColumn("ingest_batch", lit(batchId))
    // cleanedBase is already persisted + materialized, so both writes
    // are cache reads of the one computation — land them CONCURRENTLY
    // (the IndexedIngest driver-overlap rationale; write order never
    // mattered for replay, a torn attempt in either order rewrites its
    // own partitions byte-identically)
    graft.Par.run(
      () =>
        cleaned.write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(corpusPath),
      () =>
        Dedup.spanIndexRows(cleaned.select(col("doc_id"), col("text")), n)
          .withColumn("ingest_batch", lit(batchId))
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(indexPath))
    cleanedBase.unpersist(false)
    ()
  }

  /** @param autoCompactEvery when set, both stores self-OPTIMIZE once
    *        the corpus's committed batch partitions reach N (the
    *        [[StoreCompaction.compactIfNeeded]] policy, run inside the
    *        ingest's own foreachBatch — single-writer, replay-safe by
    *        the watershed skip; both stores share the batch spine so
    *        one threshold check drives both compactions). Corpus
    *        compaction passes `doc_id` so pending forget requests apply
    *        physically instead of killing the stream; the gram index
    *        has NO id column (rows are bare distinct grams, not
    *        doc-attributable), so `markDeleted` on it is unsupported —
    *        a deleted doc's grams stay indexed by design (what the
    *        store's history owned for span-dedup purposes is corpus
    *        policy, the liveView doctrine). */
  def start(docsStream: DataFrame, corpusPath: String, indexPath: String,
            checkpoint: String, n: Int,
            selfClean: Boolean = false,
            autoCompactEvery: Option[Int] = None): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), corpusPath, indexPath, batchId, n, selfClean)
        autoCompactEvery.foreach { k =>
          val spark = batch.sparkSession
          if (StoreCompaction.compactIfNeeded(spark, corpusPath, Nil, k,
              deleteIdCol = Some("doc_id")).isDefined)
            StoreCompaction.compactIfNeeded(spark, indexPath, Nil, 1)
        }
      }
      .start()
}
