package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Persisted DOCUMENT-TEXT store — the passage-fetch side of a served
  * RAG deployment, [[VecStoreIngest]]'s lifecycle on (doc_id, text):
  * the final serving stage returns text, and "forgotten" must mean the
  * TEXT stops being returnable — not merely that the id left the
  * rankings. [[view]] serves the committed rows minus deletion-vector
  * ids, so the answer-assembly point-join against it can never emit an
  * erased document's words even if a stale candidate id reaches it;
  * the next [[compact]] removes the bytes physically.
  *
  * Text stores verbatim (substring-exact, nothing derived), so the
  * fetched passage is byte-identical to the ingested one. Exactly-once,
  * replay, admission, and compaction are [[VecStoreIngest]]'s verbatim
  * — deterministic per-batch projection, `ingest_batch=` dynamic
  * overwrite, watershed skip, doc_id-sorted consolidation for
  * row-group id-lookup locality (fetches are id point-lookups, never
  * scans). */
object DocStoreIngest {

  /** @param dedupAdmission the batch-disjointness enforcement arm:
    *        within-batch duplicates collapse to min(text), re-sent ids
    *        anti-join away against the committed prior view. */
  def ingestBatch(batch: DataFrame, storePath: String, batchId: Long,
                  dedupAdmission: Boolean = false): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (batchId <= StoreCompaction.coveredThrough(spark, storePath))
      return // compacted replay: effects durable inside the generation
    val rows = batch.select(col("doc_id"), col("text"))
    val admitted =
      if (!dedupAdmission) rows
      else {
        val inBatch = rows.groupBy(col("doc_id"))
          .agg(min(col("text")).as("text"))
        val hasPrior = StoreCompaction.batchDirs(spark, storePath).nonEmpty
        if (!hasPrior) inBatch
        else inBatch.join(
          StoreCompaction.committedView(spark, storePath)
            .filter(col("ingest_batch").cast("long") < batchId)
            .select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      }
    if (admitted.isEmpty) return
    admitted
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(storePath)
  }

  def start(docsStream: DataFrame, storePath: String, checkpoint: String,
            autoCompactEvery: Option[Int] = None,
            dedupAdmission: Boolean = false): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), storePath, batchId, dedupAdmission)
        autoCompactEvery.foreach(n => StoreCompaction.compactIfNeeded(
          batch.sparkSession, storePath, Nil, n, targetFiles = 1,
          sortCols = Seq("doc_id"), deleteIdCol = Some("doc_id")))
      }
      .start()

  /** Logically forget documents: their text stops serving from [[view]]
    * immediately; the next [[compact]] removes the bytes. */
  def markDeleted(spark: SparkSession, storePath: String,
                  docIds: Seq[Long]): Unit =
    StoreCompaction.markDeleted(spark, storePath, docIds)

  /** The served (doc_id, text) frame — exactly-once minus forgotten
    * ids. The passage-fetch point-join reads THIS, never the raw
    * corpus. */
  def view(spark: SparkSession, storePath: String): DataFrame =
    StoreCompaction.liveView(spark, storePath, "doc_id")
      .select(col("doc_id"), col("text"))

  /** OPTIMIZE: one consolidated doc_id-sorted generation, pending
    * deletes applied physically. */
  def compact(spark: SparkSession, storePath: String): StoreCompaction.Watershed =
    StoreCompaction.compact(spark, storePath, Nil, targetFiles = 1,
      sortCols = Seq("doc_id"), deleteIdCol = Some("doc_id"))
}
