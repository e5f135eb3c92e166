package graft.streaming

import graft.llm.TextAnalysis
import org.apache.hadoop.fs.Path
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
    * last committed sketch snapshot from `checkpoint` first.
    *
    * Snapshot protocol: per-batch VERSIONED files (`snapshot-<id>`,
    * written as .tmp then renamed), restore = highest id, older ids
    * deleted only AFTER the new one is committed — so from the first
    * committed batch onward at least one complete snapshot always
    * exists on disk, with no window where a crash between a delete and
    * a rename could lose the whole state (the single-`latest` design
    * had exactly that window). */
  def start(docsStream: DataFrame, checkpoint: String): StreamingQuery = {
    val conf = docsStream.sparkSession.sparkContext.hadoopConfiguration
    val dir = new Path(s"$checkpoint/graft-cms")
    val fs = dir.getFileSystem(conf)
    def committed(): Seq[(Long, Path)] = {
      val st = fs.globStatus(new Path(dir, "snapshot-*"))
      if (st == null) Seq.empty
      else st.toSeq
        .filterNot(_.getPath.getName.endsWith(".tmp"))
        .map(s => s.getPath.getName.stripPrefix("snapshot-").toLong -> s.getPath)
    }
    committed().sortBy(_._1).lastOption.foreach { case (_, p) =>
      val in = fs.open(p)
      try merged = CountMinSketch.readFrom(in)
      finally in.close()
    }
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        addBatch(batch.toDF())
        val tmp = new Path(dir, s"snapshot-$batchId.tmp")
        val out = fs.create(tmp, true)
        try merged.writeTo(out)
        finally out.close()
        val dst = new Path(dir, s"snapshot-$batchId")
        // HDFS rename onto an existing destination returns FALSE (it is
        // not POSIX rename): a replay of a batch that crashed between
        // rename and stream-commit finds its own dst already there —
        // delete it first (the replayed sketch supersedes it; older
        // snapshots still exist, so there is no loss window even if we
        // crash between this delete and the rename). Any rename that
        // still fails (quota, transient FS error) must FAIL THE BATCH
        // loudly: a silently dropped snapshot followed by the deletes
        // below would reopen exactly the state-loss window this
        // versioned protocol exists to close.
        if (fs.exists(dst) && !fs.delete(dst, false))
          throw new java.io.IOException(
            s"graft-cms: cannot replace stale snapshot $dst")
        if (!fs.rename(tmp, dst) || !fs.exists(dst))
          throw new java.io.IOException(
            s"graft-cms: snapshot commit rename $tmp -> $dst failed")
        // older snapshots are deleted only now, AFTER the new snapshot
        // is verified on disk
        committed().filter(_._1 < batchId)
          .foreach { case (_, p) => fs.delete(p, false); () }
        ()
      }
      .start()
  }
}
