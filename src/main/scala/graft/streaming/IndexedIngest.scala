package graft.streaming

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Index-maintaining streaming ingest — [[IngestDedup]] upgraded to the
  * amortized production shape: instead of re-banding the ingested
  * corpus's TEXT on every micro-batch, the loop maintains a band INDEX
  * alongside the corpus (per-batch `ingest_batch=` partitions of
  * (doc_id, band, key) — `Dedup.bandIndexRows` of the survivors) and
  * probes the stored rows. Per batch, corpus cost drops from the full
  * shingle→hash→minhash→band text pipeline to a three-narrow-column
  * scan; corpus TEXT is read only to verify candidate endpoints.
  *
  * Exactly-once inherits [[IngestDedup]]'s idempotent-sink design on
  * BOTH stores: survivors and their index rows land in partitions
  * keyed by batch id with dynamic overwrite, and a batch compares only
  * against partitions written before it — replay overwrites its own
  * output (corpus AND index) and sees exactly its original corpus
  * view. Policy and output are identical to IngestDedup (spec-pinned).
  *
  * Long-lived stores compact with [[StoreCompaction]] — corpus and
  * index together, to the same watershed. Prior-view reads go through
  * the committed view (one consolidated partition instead of one per
  * trigger); a replayed batch at or below either watershed SKIPS, its
  * survivors and index rows already durable inside the generations. */
object IndexedIngest {

  def ingestBatch(batch: DataFrame, corpusPath: String, indexPath: String,
                  batchId: Long, threshold: Double): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(corpusPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDocs = batch.select(col("doc_id"), col("text"))
    if (batchDocs.isEmpty) return
    if (batchId <= math.max(StoreCompaction.coveredThrough(spark, corpusPath),
        StoreCompaction.coveredThrough(spark, indexPath)))
      return // compacted replay: effects durable inside the generations
    val partDirs = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$corpusPath/ingest_batch=*"))
    val indexDirs = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$indexPath/ingest_batch=*"))
    val prior =
      if (partDirs != null && partDirs.nonEmpty)
        Some((
          StoreCompaction.committedView(spark, corpusPath)
            .filter(col("ingest_batch") < batchId)
            .select(col("doc_id"), col("text")),
          // torn first batch: a crash between the corpus write and the
          // index write leaves corpus partitions with NO index directory
          // — reading indexPath would then throw on every replay and
          // wedge the stream. The empty-index substitute is scoped to
          // EXACTLY that case: every corpus partition carries
          // ingest_batch >= batchId (only this batch's own torn write,
          // which the `< batchId` replay filter excludes anyway). A
          // missing index beside genuinely PRIOR corpus batches is loss
          // (external deletion, partial restore) — raise rather than
          // silently degrade cross-batch near-dup to within-batch-only;
          // schema comes from the same builder so the shapes can't drift
          if (indexDirs != null && indexDirs.nonEmpty)
            StoreCompaction.committedView(spark, indexPath)
              .filter(col("ingest_batch") < batchId)
              .select(col("doc_id"), col("band"), col("key"))
          else {
            val priorCorpusBatches = partDirs.toSeq
              .map(_.getPath.getName.stripPrefix("ingest_batch="))
              .flatMap(s => scala.util.Try(s.toLong).toOption)
              .filter(_ < batchId)
            require(priorCorpusBatches.isEmpty,
              s"band index missing at $indexPath but corpus has prior " +
                s"batches ${priorCorpusBatches.sorted.mkString(",")} — " +
                "index was lost (not a torn-first-batch replay); rebuild " +
                "it with Dedup.writeBandIndex before resuming")
            Dedup.bandIndexRows(batchDocs.limit(0))
          }))
      else None
    val dropIds = Dedup.ingestDupIdsIndexed(batchDocs, prior, threshold)
    val survivors = batchDocs
      .join(dropIds, Seq("doc_id"), "left_anti")
      .withColumn("ingest_batch", lit(batchId))
      .persist()
    // force the survivor cache with one job, then land corpus and index
    // CONCURRENTLY (guide-§2.6 driver overlap): both are deterministic
    // projections of the same cached survivors into their own batch
    // partitions, so write order never mattered for replay — a torn
    // attempt in either order is healed by the same dynamic-overwrite
    // rewrite (the index-written/corpus-missing case replays as a first
    // batch and overwrites its own index partition byte-identically).
    // Per-batch wall drops from write+write to max(write, write).
    survivors.count()
    graft.Par.run(
      () =>
        survivors.write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(corpusPath),
      () =>
        Dedup.bandIndexRows(survivors.select(col("doc_id"), col("text")))
          .withColumn("ingest_batch", lit(batchId))
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(indexPath))
    survivors.unpersist(false)
    dropIds.unpersist(false)
    ()
  }

  /** @param autoCompactEvery when set, both stores self-OPTIMIZE once
    *        the corpus's committed batch partitions reach N (the
    *        [[StoreCompaction.compactIfNeeded]] policy — single-writer
    *        foreachBatch, replay-safe by the watershed skip; the two
    *        stores share the batch spine, so one check drives both). */
  def start(docsStream: DataFrame, corpusPath: String, indexPath: String,
            checkpoint: String, threshold: Double,
            autoCompactEvery: Option[Int] = None): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), corpusPath, indexPath, batchId, threshold)
        autoCompactEvery.foreach { k =>
          val spark = batch.sparkSession
          if (StoreCompaction.compactIfNeeded(spark, corpusPath, Nil, k,
              deleteIdCol = Some("doc_id")).isDefined)
            StoreCompaction.compactIfNeeded(spark, indexPath, Nil, 1,
              deleteIdCol = Some("doc_id"))
        }
      }
      .start()
}
