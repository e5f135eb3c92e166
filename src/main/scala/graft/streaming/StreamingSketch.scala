package graft.streaming

import graft.llm.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming count-min sketch over a document stream — the unbounded
  * twin of the batch sketch in `TextAnalysis.heavyHitters`/
  * `heavyHittersSketched`: each micro-batch builds its own distributed
  * CMS (partitions tree-merge inside `stat.countMinSketch`) and the
  * driver MERGES it into running state. Mergeability is the entire
  * point of the CMS at scale: cell counts are exact integer sums, so
  * batch-wise build + merge is IDENTICAL (cell-for-cell, same
  * depth/width/seed) to one sketch built over everything seen — the
  * stream answers frequency queries at any trigger with constant
  * memory and zero replay, and StreamingSketchSpec pins the equality
  * against the batch build.
  *
  * Restart safety: the merged sketch is SNAPSHOTTED to the checkpoint
  * directory after every batch (write-temp + rename) and restored by
  * `start` — without this, a restarted query resumes PAST its
  * committed batches (Structured Streaming does not replay them) on an
  * empty sketch and silently UNDERcounts, inverting the CMS's
  * one-sided error guarantee. With it, the failure mode is the native
  * direction only: a batch that crashed between merge and commit is
  * replayed and merged twice — an overestimate, which CMS consumers
  * already tolerate (StreamingSpec pins the restart path).
  *
  * Driver state is one sketch (eps/confidence-sized, corpus-
  * independent); `foreachBatch` runs batches sequentially so the
  * merge needs no lock — `snapshot` is volatile-published for readers
  * on other threads. */
final class StreamingSketch(eps: Double, confidence: Double, seed: Int) {

  @volatile private var merged: CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  /** Current merged sketch (live object; treat as read-only). */
  def snapshot: CountMinSketch = merged

  /** Folds one batch of (doc_id, text) into the running sketch —
    * factored out so the spec can replay the exact batch logic. */
  def addBatch(batch: DataFrame): Unit = {
    val cms = batch
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .stat.countMinSketch("w", eps, confidence, seed)
    val m = merged
    m.mergeInPlace(cms)
    merged = m
  }

  /** Starts consuming a streaming (doc_id, text) frame; restores the
    * last committed sketch snapshot from `checkpoint` first. Snapshot
    * protocol: [[Snapshots]] (versioned files, verified renames, prune
    * only after the new snapshot exists). */
  def start(docsStream: DataFrame, checkpoint: String): StreamingQuery = {
    val snaps = new Snapshots(s"$checkpoint/graft-cms",
      docsStream.sparkSession.sparkContext.hadoopConfiguration)
    snaps.restore(CountMinSketch.readFrom).foreach(merged = _)
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        addBatch(batch.toDF())
        snaps.commit(batchId)(merged.writeTo)
        ()
      }
      .start()
  }
}
