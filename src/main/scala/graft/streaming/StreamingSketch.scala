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
  * Driver state is one sketch (eps/confidence-sized, corpus-
  * independent); `foreachBatch` runs batches sequentially so the
  * merge needs no lock — `snapshot` is volatile-published for readers
  * on other threads. For exactly-once across restarts, pair with an
  * idempotent downstream sink keyed by batch id (the IngestDedup
  * pattern); the sketch itself tolerates replay only as an
  * overestimate, which is the CMS's native error direction. */
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

  /** Starts consuming a streaming (doc_id, text) frame. */
  def start(docsStream: DataFrame, checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) => addBatch(batch.toDF()) }
      .start()
}
