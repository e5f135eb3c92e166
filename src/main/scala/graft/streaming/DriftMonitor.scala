package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source distribution-drift monitor — the live twin of
  * `TextAnalysis.sourceLengthDrift` AND `sourceLengthKs`: as documents
  * arrive, each source accumulates a length-bin histogram in state and
  * every trigger emits BOTH drift statistics against a FIXED reference
  * histogram (the deployment reality: the reference is the last
  * known-good corpus, recomputed offline by the batch operators; the
  * stream watches for a source drifting away from it). The two
  * statistics are complements over the SAME state — TV sums per-bin
  * disagreement (everywhere-a-little drift: a boilerplate flood), KS
  * takes the worst single CDF gap (a localized shift: the truncation
  * bug that clips every long doc moves KS hard while diluting TV
  * across bins) — so one histogram buys both alarms per trigger.
  *
  * Exactness: identical discipline to the batch twins — bin counts are
  * integers; l1 is the cross-multiplied BIGINT Σ_b |c_b·R − ref_b·n|
  * (R = reference total, n = source total) with tv = l1 / (2·n·R);
  * ks_num is the cross-multiplied BIGINT max_b |Cum_b·R − CumRef_b·n|
  * with ks = ks_num / (n·R) — each one float division, no rounding
  * (the sourceLengthKs discipline).
  *
  * Scale: state is `reference.size` longs per source — constant
  * regardless of stream length, sharded by source. Documents are
  * binned by the caller's projection (same `min(n_toks div width,
  * nbins−1)` expression as the batch operator), so the state function
  * only increments a counter per row. */
object DriftMonitor {

  /** One arriving document, already length-binned by the caller. */
  case class BinnedDoc(doc_id: Long, source: String, bin: Int)

  /** The source's drift after this trigger: TV (`l1`, `tv`) and KS
    * (`ks_num`, `ks`) vs the reference, over everything the source has
    * streamed so far. */
  case class SourceDrift(source: String, n_docs: Long, l1: Long, tv: Double,
                         ks_num: Long, ks: Double)

  case class BinCounts(counts: Seq[Long])

  def sourceDriftUpdates(docs: Dataset[BinnedDoc],
                         reference: Seq[Long]): Dataset[SourceDrift] = {
    require(reference.nonEmpty && reference.forall(_ >= 0),
      s"need a non-empty, non-negative reference histogram")
    val refN = reference.sum
    require(refN > 0, "reference histogram is all-zero")
    val spark = docs.sparkSession
    import spark.implicits._
    val nbins = reference.size
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source: String, it: Iterator[BinnedDoc], state: GroupState[BinCounts]) =>
          val counts = state.getOption.map(_.counts.toArray)
            .getOrElse(Array.fill(nbins)(0L))
          it.foreach { d =>
            val b = math.min(math.max(d.bin, 0), nbins - 1)
            counts(b) += 1
          }
          state.update(BinCounts(counts.toSeq))
          val n = counts.sum
          val l1 = counts.indices
            .map(b => math.abs(counts(b) * refN - reference(b) * n)).sum
          val tv = if (n == 0) 0.0 else l1.toDouble / (2L * n * refN).toDouble
          // KS over the same histogram: running cumulatives in bin
          // order, worst cross-multiplied CDF gap
          var cumSrc = 0L
          var cumRef = 0L
          var ksNum = 0L
          counts.indices.foreach { b =>
            cumSrc += counts(b)
            cumRef += reference(b)
            val gap = math.abs(cumSrc * refN - cumRef * n)
            if (gap > ksNum) ksNum = gap
          }
          val ks = if (n == 0) 0.0 else ksNum.toDouble / (n * refN).toDouble
          Iterator(SourceDrift(source, n, l1, tv, ksNum, ks))
      }
  }
}
