package graft.streaming

import graft.analytics.DataQuality
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming admission through the declarative constraint suite — the
  * per-micro-batch twin of the batch publish gate (`q_dq_checks` /
  * `DataQuality.publishGated`): every arriving batch is evaluated
  * against the suite's per-row rules; a PASSING batch lands in the
  * accepted corpus, a FAILING batch is quarantined WHOLE (its rows plus
  * a per-check verdict log), never silently dropped and never mixed
  * into accepted data. Batch-level (not row-level) admission is the
  * deliberate policy: a batch violating its contract is evidence of an
  * upstream regression — the fix is at the producer, and admitting the
  * "clean" rows of a corrupted batch destroys the audit trail.
  *
  * Exactly-once on replay without a transactional sink: accepted rows,
  * quarantined rows, and the verdict log all land in partitions keyed
  * by the micro-batch id with dynamic partition overwrite — a replayed
  * batch overwrites its own partitions, and because the rules are
  * deterministic per-row predicates the replay reaches the same
  * verdict, so a batch can never end up in both stores.
  *
  * Scale shape: per batch, the rules fold into ONE conditional-sum
  * aggregate over one pass of the batch (the `DataQuality.
  * ruleViolations` shape) — no state store, no corpus read; the gate's
  * cost tracks the batch, making it safe in front of any volume. */
object QualityGate {

  /** Live corpus card — the streaming twin of `TextAnalysis.datasheet`'s
    * ADDITIVE integers: per source, running doc count, token volume, and
    * Gopher-pass count, maintained by a native streaming aggregate (the
    * per-row flags are stateless Column compute — `gopherRules` runs
    * unchanged on a stream — so state is exactly ONE row per source,
    * bounded by the source universe, no watermark needed). At every
    * trigger the complete-mode table equals the batch datasheet's
    * (n_docs, n_tokens, n_gopher_pass) over everything ingested so far
    * (spec-pinned). The datasheet's non-additive columns (corpus-wide
    * dup fractions, language shares) stay batch-side by design: they
    * need a text-partition window over the WHOLE corpus, which is the
    * publish-time pass, not the monitor. */
  def corpusCard(docsStream: DataFrame,
                 minWords: Int, maxWords: Int,
                 minAvgLen: Double, maxAvgLen: Double,
                 minStopHits: Int, minAlphaFrac: Double): DataFrame =
    graft.llm.TextAnalysis.gopherRules(docsStream, minWords, maxWords,
        minAvgLen, maxAvgLen, minStopHits, minAlphaFrac,
        carry = Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_tokens"),
        sum(col("passes").cast("long")).as("n_gopher_pass"))

  /** Processes one micro-batch; factored out so the spec can pin
    * replay idempotence by calling it directly. */
  def gateBatch(batch: DataFrame, rules: Seq[(String, Column)],
                acceptedPath: String, quarantinePath: String,
                verdictPath: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val suite = DataQuality.suite(Seq(DataQuality.ruleViolations(batch, rules)))
      .withColumn("gate_batch", lit(batchId))
    val verdicts = suite.collect() // checks-sized by construction
    suite.sparkSession.createDataFrame(
      suite.sparkSession.sparkContext.parallelize(verdicts.toSeq, 1), suite.schema)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("gate_batch").parquet(verdictPath)
    val passed = verdicts.forall(_.getBoolean(2))
    val dest = if (passed) acceptedPath else quarantinePath
    batch.withColumn("gate_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("gate_batch").parquet(dest)
  }

  /** Starts the gated ingestion stream over any streaming DataFrame
    * whose columns the rule predicates reference. */
  def start(stream: DataFrame, rules: Seq[(String, Column)],
            acceptedPath: String, quarantinePath: String,
            verdictPath: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        gateBatch(batch.toDF(), rules, acceptedPath, quarantinePath,
          verdictPath, batchId)
      }
      .start()
}
