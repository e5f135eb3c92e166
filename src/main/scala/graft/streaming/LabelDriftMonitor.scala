package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-label embedding-drift monitor — the live twin of
  * `Similarity.labelDrift` and the embedding-space complement of
  * [[DriftMonitor]]'s length-histogram alarms: as vectors arrive, each
  * label accumulates its int8-code centroid SUMS in state and every
  * trigger emits the cosine between that running centroid and a FIXED
  * reference centroid (the deployment reality: the reference is the
  * corpus-mean sum vector from the last known-good offline
  * `labelDrift` run; the stream watches a shard/source/encoder-version
  * drifting away from it). An encoder skew or corrupted batch shows up
  * as one label's cosine dropping within a trigger of arrival.
  *
  * Exactness: identical discipline to the batch twin — the caller
  * projects arrivals through `Similarity.int8CodeRows` (ONE shared
  * quantization definition), state is the per-label integer code-sum
  * vector plus a count (commutative, arrival-order-invariant), and the
  * cosine is the batch operator's exact op sequence: integer dot/na2/
  * nb2, then cast, sqrt, sqrt, mul, ONE division — with `reference` set
  * to the batch run's global sums, the streamed rows equal
  * `labelDrift`'s BITWISE (spec-pinned). NULL cosine for a degenerate
  * all-zero side, exactly like the batch twin.
  *
  * Scale: state is dim+1 longs per label — constant regardless of
  * stream length, sharded by label. Sum bounds are the batch twin's:
  * per-dim sums < 127·n_label, cross products < 2^63 until ~10^8
  * vectors per label at 64 dims. */
object LabelDriftMonitor {

  /** One arriving vector, already int8-coded by the caller's
    * `Similarity.int8CodeRows` projection. */
  case class CodedVec(vec_id: Long, label: Long, codes: Seq[Long])

  /** Running per-label centroid: integer code sums + member count. */
  case class CentroidState(sums: Seq[Long], n: Long)

  /** The label's drift after this trigger, over everything the label
    * has streamed so far — `labelDrift`'s output row shape. */
  case class LabelDrift(label: Long, n_vecs: Long, dot: Long, na2: Long,
                        nb2: Long, cos_drift: Option[Double])

  def labelDriftUpdates(vecs: Dataset[CodedVec],
                        reference: Seq[Long]): Dataset[LabelDrift] = {
    require(reference.nonEmpty, "need a non-empty reference centroid-sum vector")
    val dim = reference.size
    val nb2 = reference.map(r => r * r).sum
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.groupByKey(_.label)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (label: Long, it: Iterator[CodedVec], state: GroupState[CentroidState]) =>
          val sums = state.getOption.map(_.sums.toArray)
            .getOrElse(Array.fill(dim)(0L))
          var n = state.getOption.map(_.n).getOrElse(0L)
          it.foreach { v =>
            require(v.codes.size == dim,
              s"label $label: got a ${v.codes.size}-dim code vector, " +
                s"reference is $dim-dim")
            var i = 0
            while (i < dim) { sums(i) += v.codes(i); i += 1 }
            n += 1
          }
          state.update(CentroidState(sums.toSeq, n))
          var dot = 0L
          var na2 = 0L
          var i = 0
          while (i < dim) {
            dot += sums(i) * reference(i)
            na2 += sums(i) * sums(i)
            i += 1
          }
          val cos =
            if (na2 == 0L || nb2 == 0L) None
            else Some(dot.toDouble /
              (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)))
          Iterator(LabelDrift(label, n, dot, na2, nb2, cos))
      }
  }
}
