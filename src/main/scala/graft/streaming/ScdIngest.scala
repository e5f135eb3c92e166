package graft.streaming

import graft.ops.{ManifestSink, ScdMerge}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD2 dimension maintenance — the CDC-consumer composition
  * of [[graft.ops.ScdMerge]] (the MERGE semantics) and
  * [[graft.ops.ManifestSink]] (the commit protocol): each micro-batch
  * of change rows merges against the last committed history snapshot
  * and publishes the merged history as a NEW manifest version, stamped
  * with the batch id as both the SCD version (`valid_from`/`valid_to`)
  * and the manifest version. Readers always resolve a complete,
  * committed snapshot; a crash mid-publish leaves an uncommitted data
  * directory no reader can see.
  *
  * Exactly-once: the manifest version IS the batch id, so replay is
  * decided by a directory listing — a batch whose manifest committed is
  * SKIPPED (its effects are already durable), and a torn attempt (data
  * written, manifest never renamed) is deleted and rewritten by
  * `publishAt`. A replayed batch merges against the same base (the
  * latest version < its id — later versions cannot exist: streaming
  * replays only the last in-flight batch) over the same input, so the
  * rewritten snapshot is identical. Unlike the dynamic-partition
  * ingests (corpus facts accumulate per batch), SCD2 is a FULL-TABLE
  * rewrite per merge — dimensions are small relative to facts, which
  * is what makes the snapshot-per-version layout the honest shape; at
  * 100 TB facts the dimension history this maintains is still GBs.
  *
  * Empty batches publish nothing (no version burned, the IndexedIngest
  * convention).
  *
  * A CDC trigger can carry SEVERAL updates for one key — but
  * [[graft.ops.ScdMerge.merge]] requires at most one change row per key
  * (two rows for a key would fan out through the full-outer join and
  * corrupt the snapshot: duplicated pass-through rows, two open rows).
  * Callers with ordered CDC pass `seqCol` (LSN / source offset / event
  * time) and each batch collapses to the key's LAST change —
  * deterministically, via `max(struct(seq, attrs…))` whose lexicographic
  * tie-break keeps replay rewrites byte-identical even on seq ties.
  * Without `seqCol` there is no defensible winner, so a multi-row key
  * fails the batch loudly instead of corrupting history forever. */
object ScdIngest {

  /** One change row per key, or a loud error: the precondition
    * [[graft.ops.ScdMerge.merge]] needs, enforced per micro-batch.
    * With `opCol` set the op rides the collapse struct (after seq,
    * before attrs — still deterministic on seq ties) so a delete
    * followed by a re-insert within one trigger keeps the re-insert. */
  private[streaming] def collapseToLastPerKey(
      changes: DataFrame, key: String, attrs: Seq[String],
      seqCol: Option[String], batchId: Long,
      opCol: Option[String] = None): DataFrame = seqCol match {
    case Some(sc) =>
      val carried = opCol.toSeq ++ attrs
      changes.groupBy(col(key))
        .agg(max(struct(col(sc).as("_seq") +: carried.map(col): _*)).as("_m"))
        .select(col(key) +: carried.map(a => col(s"_m.$a").as(a)): _*)
    case None =>
      // one-pass guard: the per-key count rides a key-keyed window whose
      // hashpartitioning(key) is the SAME exchange the merge's full-outer
      // sort-merge join needs on the change side — no extra scan or
      // shuffle per trigger (vs an eager groupBy().collect() pre-check).
      // assert_true is non-foldable so the guard survives optimization;
      // a duplicate key fails the batch as a task error BEFORE the
      // manifest commit, so the failed batch publishes nothing.
      val wk = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
      changes
        .withColumn("_kc", count(lit(1)).over(wk))
        .filter(assert_true(col("_kc") === 1L,
          concat(
            lit(s"ScdIngest batch $batchId carries multiple change rows for key "),
            col(key).cast("string"),
            lit(" — an SCD2 merge has no well-defined outcome for " +
              "conflicting rows; pass seqCol to collapse each key to its " +
              "last change, or dedupe upstream"))).isNull)
        .drop("_kc")
  }

  /** @param opCol when set, the CDC op column ('U' upsert / 'D' delete)
    *               — each batch merges through
    *               [[graft.ops.ScdMerge.mergeOps]], so deletes close
    *               open rows (tombstones) and later upserts re-insert. */
  def ingestBatch(changes: DataFrame, historyDir: String, key: String,
                  attrs: Seq[String], batchId: Long,
                  seqCol: Option[String] = None,
                  opCol: Option[String] = None): Unit = {
    val spark = changes.sparkSession
    if (changes.isEmpty) return
    val versions = ManifestSink.committedVersions(spark, historyDir)
    if (versions.contains(batchId)) return // completed replay: already durable
    val history = versions.filter(_ < batchId).lastOption match {
      case Some(v) => ManifestSink.readAt(spark, historyDir, v)
      case None => // first batch: empty history with the output schema
        changes.select((col(key) +: attrs.map(col)): _*).limit(0)
          .withColumn("valid_from", lit(0L))
          .withColumn("valid_to", lit(null).cast("long"))
          .withColumn("is_current", lit(true))
    }
    val collapsed = collapseToLastPerKey(changes, key, attrs, seqCol,
      batchId, opCol)
    ManifestSink.publishAt(
      opCol match {
        case Some(oc) =>
          ScdMerge.mergeOps(history, collapsed, key, attrs, oc, batchId)
        case None => ScdMerge.merge(history, collapsed, key, attrs, batchId)
      },
      historyDir, batchId)
  }

  def start(changeStream: DataFrame, historyDir: String, key: String,
            attrs: Seq[String], checkpoint: String,
            seqCol: Option[String] = None,
            opCol: Option[String] = None): StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), historyDir, key, attrs, batchId, seqCol, opCol)
      }
      .start()

  /** The served dimension: the latest committed history snapshot. */
  def currentHistory(spark: SparkSession, historyDir: String): DataFrame =
    ManifestSink.read(spark, historyDir)

  /** Streaming point-in-time enrichment — the read side live: each
    * micro-batch of fact rows joins the attributes that were current at
    * its own version stamp, against the LATEST COMMITTED history
    * snapshot at trigger time (the manifest protocol guarantees a
    * complete snapshot — never a half-written merge). This is the
    * stream-static join pattern with a versioned static side: facts
    * stamped with past versions resolve their historical attributes,
    * not today's — the property a plain dimension join cannot give.
    * Enriched batches land in per-batch partitions with dynamic
    * overwrite (the IngestDedup exactly-once discipline). */
  def enrichStream(factStream: DataFrame, historyDir: String, outPath: String,
                   key: String, timeCol: String, attrs: Seq[String],
                   checkpoint: String): StreamingQuery =
    factStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          ScdMerge.pointInTime(
              currentHistory(batch.sparkSession, historyDir),
              batch.toDF(), key, timeCol, attrs)
            .withColumn("enrich_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("enrich_batch")
            .parquet(outPath)
        }
      }
      .start()
}
