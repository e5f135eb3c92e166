package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Persisted FLOAT-VECTOR store — the refine/rerank side of a served
  * ANN deployment, closing the last raw-corpus dependency the index
  * family left open: [[VectorIndexIngest]] stores only integer codes
  * (that is its point), so every exact stage — the FAISS refine rerank
  * (`Similarity.refineExact`), the MMR candidate fetch
  * (`Similarity.mmrCandidatePool`) — had to take the caller's raw
  * embeddings frame. This store holds the ORIGINAL (vec_id, embedding)
  * rows through the same ingest → committedView → deletion-vector →
  * compaction lifecycle, and [[view]] serves them as a drop-in `emb`
  * frame: the rerank fetch becomes a broadcast point-join against the
  * store's liveView, so the whole propose → rerank → de-crowd tail runs
  * STORE-ONLY, with forget composed — an erased id cannot be fetched
  * even as a rerank candidate, because the view subtracts it before the
  * point-join.
  *
  * The embedding column stores VERBATIM (no cast): float and double
  * arrays both round-trip parquet bit-exactly, so any kernel downstream
  * of [[view]] sees exactly the bits the one-shot path sees and every
  * score stays bitwise (spec-pinned twin equality).
  *
  * Exactly-once is [[VectorIndexIngest]]'s verbatim: the per-batch
  * projection is deterministic, partitions are `ingest_batch=`, replay
  * rewrites its own partition byte-identically via dynamic overwrite,
  * and a batch at or below a compacted watershed SKIPS. At 100 TB the
  * store is the id-keyed vector service: probes fetch R·Q rows by
  * vec_id point lookup, never scan — [[compact]] consolidates sorted by
  * vec_id so row-group min/max skipping serves those lookups. */
object VecStoreIngest {

  /** @param dedupAdmission enforce vec_id batch-disjointness instead of
    *        assuming it — [[VectorIndexIngest.ingestBatch]]'s contract
    *        and mechanism verbatim (lowest embedding within the batch,
    *        anti-join against the committed prior view across batches).
    *        Without it a re-sent id would fetch twice and double a
    *        rerank candidate. */
  def ingestBatch(batch: DataFrame, storePath: String, batchId: Long,
                  dedupAdmission: Boolean = false): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (batchId <= StoreCompaction.coveredThrough(spark, storePath))
      return // compacted replay: effects durable inside the generation
    val rows = batch.select(col("vec_id"), col("embedding"))
    val admitted =
      if (!dedupAdmission) rows
      else {
        val inBatch = rows.groupBy(col("vec_id"))
          .agg(min(col("embedding")).as("embedding"))
        val hasPrior = StoreCompaction.batchDirs(spark, storePath).nonEmpty
        if (!hasPrior) inBatch
        else inBatch.join(
          StoreCompaction.committedView(spark, storePath)
            .filter(col("ingest_batch").cast("long") < batchId)
            .select(col("vec_id")),
          Seq("vec_id"), "left_anti")
      }
    if (admitted.isEmpty) return
    admitted
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(storePath)
  }

  /** @param autoCompactEvery the [[VectorIndexIngest.start]] policy
    *        hook: self-OPTIMIZE once committed batch partitions above
    *        the watershed reach N (single-writer, replay-safe). */
  def start(vecStream: DataFrame, storePath: String, checkpoint: String,
            autoCompactEvery: Option[Int] = None,
            dedupAdmission: Boolean = false): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), storePath, batchId, dedupAdmission)
        autoCompactEvery.foreach(n => StoreCompaction.compactIfNeeded(
          batch.sparkSession, storePath, Nil, n, targetFiles = 1,
          sortCols = Seq("vec_id"), deleteIdCol = Some("vec_id")))
      }
      .start()

  /** Logically forget vectors: [[view]] excludes them immediately, the
    * next [[compact]] removes them physically. */
  def markDeleted(spark: SparkSession, storePath: String,
                  vecIds: Seq[Long]): Unit =
    StoreCompaction.markDeleted(spark, storePath, vecIds)

  /** The served (vec_id, embedding) frame — exactly-once across batches
    * and generations, minus logically-deleted ids (deletion-vector
    * subtraction, a broadcast anti-join). A drop-in `emb` argument for
    * `refineExact` / `mmrRerankStored` / `collectVectors`: same column
    * names, same stored bits. */
  def view(spark: SparkSession, storePath: String): DataFrame =
    StoreCompaction.liveView(spark, storePath, "vec_id")
      .select(col("vec_id"), col("embedding"))

  /** OPTIMIZE: one consolidated generation sorted by vec_id (row-group
    * min/max serves the id point-lookups the refine fetch makes),
    * pending deletes applied physically. [[StoreCompaction.vacuum]]
    * after, at the caller's retention policy. */
  def compact(spark: SparkSession, storePath: String): StoreCompaction.Watershed =
    StoreCompaction.compact(spark, storePath, Nil, targetFiles = 1,
      sortCols = Seq("vec_id"), deleteIdCol = Some("vec_id"))
}
