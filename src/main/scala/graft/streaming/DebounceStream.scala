package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event debounce — the live twin of
  * `Analytics.debounceEvents`: per (user, event_type) key, keep an
  * arriving event only when it opens a new burst chain (more than
  * `gapUs` after the key's PREVIOUS event), suppressing retry storms /
  * double-clicks / at-least-once duplicates at ingest instead of in a
  * nightly batch.
  *
  * Chain semantics match the batch twin exactly: state is the key's
  * LAST SEEN event time — updated by every arrival, kept or dropped —
  * so a storm ticking inside the gap keeps extending its own chain and
  * emits exactly one event however long it lasts. One long per key,
  * constant regardless of stream length.
  *
  * Ordering: WITHIN a trigger each key's events process in (tus,
  * event_id) order — the group's rows are buffered and sorted, bounded
  * by the trigger's own size — so a stream whose triggers respect event
  * time reproduces the batch operator bitwise (spec-pinned). ACROSS
  * triggers an out-of-order late event compares against the newest time
  * seen, not its event-time predecessor (inherent to any online
  * debounce); the batch operator is the authoritative re-statement once
  * data is at rest. */
object DebounceStream {

  case class Ev(event_id: Long, user_id: Long, event_type: String, tus: Long)

  case class LastSeen(tus: Long)

  def debounceUpdates(events: Dataset[Ev], gapUs: Long): Dataset[Ev] = {
    require(gapUs >= 1, s"need gapUs >= 1, got $gapUs")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Long, String), it: Iterator[Ev], state: GroupState[LastSeen]) =>
          var last = state.getOption.map(_.tus)
          val kept = scala.collection.mutable.ArrayBuffer.empty[Ev]
          it.toArray.sortBy(e => (e.tus, e.event_id)).foreach { e =>
            if (last.forall(t => e.tus - t > gapUs)) kept += e
            // every arrival extends the chain, kept or not
            if (last.forall(_ < e.tus)) last = Some(e.tus)
          }
          last.foreach(t => state.update(LastSeen(t)))
          kept.iterator
      }
  }
}
