package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming operators over the `events` stream shape
  * (ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, ...).
  *
  * The reference is pure batch — this module is the engine's streaming
  * surface for the same aggregations: `hourlyWindowedStats` is the
  * streaming twin of the `events_window` contract query (identical
  * grouping/aggregates, plus a watermark so state is bounded), and
  * `runningUserTotals` shows the custom-state path via
  * mapGroupsWithState.
  *
  * Scale notes: the windowed aggregate shuffles once per trigger on
  * (window, event_type) with partial aggregation map-side; the watermark
  * evicts windows older than the lateness bound, so state size is
  * O(active windows x event types), independent of stream length. The
  * stateful per-user operator partitions by user_id — state is sharded
  * across executors and survives through the checkpoint location.
  */
object EventStream {

  /** Tumbling 1-hour window counts/sums per event type. Works on a
    * streaming OR batch DataFrame with (ts, event_type, value). */
  def hourlyWindowedStats(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessionization (batch form): a new session starts when a
    * user's inter-event gap exceeds `gapMicros`. Input needs
    * (user_id, event_id, tus) with tus = event time in epoch micros;
    * output one row per session: (user_id, session_id, n_events,
    * start_us, end_us). Window functions partition by user, so state is
    * per-user and shuffles once.
    *
    * SKEW at scale: a hot key (bot account) lands its ENTIRE history in
    * one task here — the lag/running-sum window cannot be split. The
    * 100 TB path for skewed corpora is `sessionWindowStats`: the native
    * session_window is an AGGREGATE, so map-side partial merging trims
    * hot keys before the shuffle and AQE can split what remains; this
    * window formulation stays the contract query (its running session
    * ids are SQL-mirrorable) at gate scale. */
  def sessionize(events: DataFrame, gapMicros: Long = 1800L * 1000 * 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    events
      .withColumn("prev", lag(col("tus"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull || col("tus") - col("prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min("tus").as("start_us"), max("tus").as("end_us"))
  }

  /** Native session-window aggregation — the streaming-capable twin of
    * `sessionize`: `session_window(ts, gap)` merges events of a user
    * into sessions whose gaps are < `gapSeconds`, works identically on
    * batch and streaming frames (add a watermark upstream for bounded
    * streaming state), and at scale is ONE gap-merging aggregate instead
    * of the window-function lag/running-sum pair.
    *
    * Boundary semantics: an event exactly `gap` after its predecessor
    * MERGES into the session (session windows close at last+gap
    * INCLUSIVE — verified against Spark 4.1, and pinned by spec) — the
    * same `> gap`-starts-new-session rule as `sessionize`, and the
    * oracle mirrors it.
    * Input needs (user_id, tus epoch-micros).
    * Output: (user_id, start_us, end_us, n_events), end = last event. */
  def sessionWindowStats(events: DataFrame, gapSeconds: Long = 1800,
                         watermark: Option[String] = None): DataFrame = {
    val withTs = events.withColumn("ts", expr("timestamp_micros(tus)"))
    // streaming session windows need the watermark ON THIS ts column
    // (a watermark on a column dropped upstream does not carry over)
    val src = watermark.fold(withTs)(w => withTs.withWatermark("ts", w))
    src
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"), min("tus").as("start_us"), max("tus").as("end_us"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
  }

  /** Stream-stream interval join: attribute each click to the view(s) of
    * the same user within the preceding `horizonSec` seconds. Both sides
    * carry watermarks, and the join condition bounds the event-time gap
    * in BOTH directions, so Spark can evict buffered state once the
    * watermark passes the horizon — state is O(events per horizon), not
    * O(stream). Inputs need (user_id, ts, event_id) each; output one row
    * per qualifying (view, click) pair.
    *
    * This is the streaming twin of the batch as-of join (`q_asof_join`):
    * the batch form picks only the latest prior view, which streaming
    * can't do with bounded state (a later view can always arrive before
    * the watermark closes), so the streaming contract is the windowed
    * pair set — downstream dedup picks winners once the window closes. */
  def clickAttribution(views: DataFrame, clicks: DataFrame,
                       horizonSec: Long = 3600, watermark: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Streaming exact dedup on `keyCols` with bounded state: duplicates
    * arriving within the watermark horizon are dropped; state for keys
    * older than the watermark is evicted, so memory is O(keys per
    * horizon), independent of stream length — the streaming twin of
    * `Dedup.exact`. Works on a streaming DataFrame with an event-time
    * column `tsCol`. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class StageEvent(user_id: Long, event_type: String, tus: Long)
  case class StageTimes(times: Seq[Long])
  case class UserStage(user_id: Long, stage: Int)

  /** STREAMING funnel twin of `graft.analytics.Analytics.funnel`:
    * maintains each user's first-seen time per stage as explicit state
    * (flatMapGroupsWithState) and emits (user_id, stage) whenever the
    * user's furthest IN-ORDER stage prefix advances — `stage` is the
    * 0-based index of the furthest stage reached with strictly
    * increasing first-times, or -1 while the user hasn't hit stage 0.
    * Out-of-order arrival is handled by keeping per-stage MINIMUM times
    * in state, so once the stream drains the final update per user
    * matches the batch funnel exactly (spec-pinned); per-stage counts
    * are a downstream aggregate over the latest update per user.
    *
    * Scale: state is `stages.length` longs per user, sharded by user_id
    * across the state store — O(users), independent of stream length,
    * the same bound as any per-user stateful operator. */
  def funnelStageUpdates(events: Dataset[StageEvent],
                         stages: Seq[String]): Dataset[UserStage] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val None_ = Long.MaxValue
    val stageIdx = stages.zipWithIndex.toMap
    def furthest(t: Seq[Long]): Int = {
      var i = 0
      while (i < t.length && t(i) != None_ && (i == 0 || t(i - 1) < t(i))) i += 1
      i - 1
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[StageEvent], state: GroupState[StageTimes]) =>
          val times = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(stages.length)(None_))
          val before = furthest(times.toSeq)
          it.foreach { e =>
            stageIdx.get(e.event_type).foreach { i =>
              if (e.tus < times(i)) times(i) = e.tus
            }
          }
          state.update(StageTimes(times.toSeq))
          val after = furthest(times.toSeq)
          if (after != before) Iterator(UserStage(user, after)) else Iterator.empty
      }
  }

  case class HourEvent(user_id: Long, hour: Long)
  case class UserHours(cohort: Long, hours: Seq[Long])
  case class RetentionDelta(cohort_hour: Long, offset_hours: Long, delta: Int)

  /** Streaming twin of `analytics.Analytics.retention`: per-user cohort
    * (first-seen hour) and activity-hour state, emitting DELTAS of
    * retention-matrix cells — downstream `sum(delta)` grouped by
    * (cohort_hour, offset_hours) reproduces the batch matrix at every
    * trigger. Late data is handled by RETRACTION: an event earlier than
    * the user's known cohort rebases every one of their cells (−1 the
    * old, +1 the rebased) — the batch semantics (cohort = global min)
    * preserved exactly on an unbounded stream, which a watermark-only
    * formulation cannot do (dropping the late event would freeze a
    * wrong cohort).
    *
    * State per user is O(distinct active hours); production bounds it
    * by capping the matrix horizon (drop hours > cohort + H inside the
    * update — cells past the horizon are never reported anyway).
    * Update output mode; state shards by user_id like every stateful
    * per-user operator here. */
  def retentionCellUpdates(events: Dataset[HourEvent]): Dataset[RetentionDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[HourEvent], state: GroupState[UserHours]) =>
          val prev = state.getOption
          val oldHours = prev.map(_.hours.toSet).getOrElse(Set.empty[Long])
          val newHours = oldHours ++ it.map(_.hour)
          if (newHours.isEmpty) Iterator.empty
          else {
            val cohort = newHours.min
            state.update(UserHours(cohort, newHours.toSeq))
            val oldCells = prev match {
              case Some(p) => oldHours.map(h => (p.cohort, h - p.cohort))
              case None => Set.empty[(Long, Long)]
            }
            val newCells = newHours.map(h => (cohort, h - cohort))
            (oldCells -- newCells).iterator.map { case (c, o) => RetentionDelta(c, o, -1) } ++
              (newCells -- oldCells).iterator.map { case (c, o) => RetentionDelta(c, o, 1) }
          }
      }
  }

  case class SeqEvent(user_id: Long, event_id: Long, event_type: String, tus: Long)
  case class UserSeq(events: Seq[SeqEvent], hw: Long)
  case class TransitionDelta(prev_type: String, next_type: String, delta: Long)

  /** Streaming twin of `analytics.Analytics.transitionMatrix`: per-user
    * ordered-sequence state emitting DELTAS of (prev_type, next_type)
    * transition cells — downstream `sum(delta)` grouped by the pair
    * reproduces the batch matrix's `n_transitions` at every trigger
    * (`prob` derives from the counts exactly as in batch). Late data is
    * handled by RETRACTION, the retentionCellUpdates discipline: an
    * event landing in the MIDDLE of a user's seen sequence retracts the
    * (pred, succ) pair it splits (−1) and asserts the two pairs it
    * creates (+1 each) — the batch semantics (global (tus, event_id)
    * order per user) preserved exactly on an unbounded stream, which a
    * drop-late watermark cannot do. The trigger's group iterator is NOT
    * time-ordered (the DebounceStream trap) — incoming events merge
    * into the state and the whole sequence re-sorts by (tus, event_id)
    * before pairs are read.
    *
    * State per user is its event sequence — the price of exact
    * insert-anywhere retraction; `horizonMicros` bounds it with an
    * event-time horizon: state events older than (per-user high-water
    * tus − H) are pruned, keeping ONE boundary event so the chain pair
    * into the retained region stays representable (its retraction-free
    * immutability is the horizon's contract), and an arriving event
    * older than the pruned frontier is DISCARDED — it could only split
    * pairs that already fell off the state, and inserting it against a
    * truncated prefix would assert pairs the true sequence never had.
    * The emitted deltas over the RETAINED window remain exact: pruning
    * happens after delta emission, and `before` at the next trigger is
    * computed from the same pruned sequence that was stored. With
    * `horizonMicros = None` (the default) semantics are the original
    * unbounded exact-retraction ones. Update output mode; state shards
    * by user_id. */
  def transitionCellUpdates(events: Dataset[SeqEvent],
                            horizonMicros: Option[Long] = None)
      : Dataset[TransitionDelta] = {
    horizonMicros.foreach(h =>
      require(h >= 0L, s"need horizonMicros >= 0, got $h"))
    val spark = events.sparkSession
    import spark.implicits._
    def pairCounts(s: Seq[SeqEvent]): Map[(String, String), Long] =
      if (s.length < 2) Map.empty
      else s.zip(s.tail).groupMapReduce(
        p => (p._1.event_type, p._2.event_type))(_ => 1L)(_ + _)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[SeqEvent], state: GroupState[UserSeq]) =>
          val prevState = state.getOption
          val prev = prevState.map(_.events).getOrElse(Seq.empty)
          val prevHw = prevState.map(_.hw).getOrElse(Long.MinValue)
          // beyond-horizon late arrivals are dropped against the PREVIOUS
          // trigger's frontier — the frontier the stored prefix was pruned to
          val arrived = horizonMicros match {
            case Some(h) if prevHw != Long.MinValue =>
              it.filter(e => e.tus >= prevHw - h).toSeq
            case _ => it.toSeq
          }
          val merged = (prev ++ arrived).sortBy(e => (e.tus, e.event_id))
          val hw = (prevHw +: merged.map(_.tus)).max
          val pruned = horizonMicros match {
            case Some(h) if merged.nonEmpty =>
              val cutoff = hw - h
              val (old, keep) = merged.partition(_.tus < cutoff)
              if (old.isEmpty) merged else old.last +: keep
            case _ => merged
          }
          state.update(UserSeq(pruned, hw))
          val before = pairCounts(prev)
          val after = pairCounts(merged)
          (before.keySet ++ after.keySet).iterator.flatMap { k =>
            val d = after.getOrElse(k, 0L) - before.getOrElse(k, 0L)
            if (d != 0L) Iterator(TransitionDelta(k._1, k._2, d)) else Iterator.empty
          }
      }
  }

  case class AsofEvent(user_id: Long, event_id: Long, event_type: String, tus: Long)
  case class AsofState(vLatest: Long, vPrevDistinct: Long, seen: Boolean)
  case class AsofMatch(user_id: Long, event_id: Long, click_us: Long,
                       recent_view_us: Option[Long])

  /** Streaming twin of `ops/AsofJoin.lastBeforeWithin` — each LEFT event
    * (`leftType`, e.g. click) emits once, enriched with the time of the
    * latest RIGHT event (`rightType`, e.g. view) STRICTLY before it and
    * within `toleranceMicros`; staler or absent matches emit null,
    * exactly the batch operator's attribution-horizon semantics
    * (spec-pinned ≡ batch on event-time-ordered triggers, the
    * DebounceStream contract — intra-trigger order is free: the group
    * sorts by (tus, event_id) before the walk, so a right event landing
    * in the same trigger as its left still matches).
    *
    * State per user is TWO longs — the latest right time and the
    * latest strictly-earlier distinct right time (the tie case: a right
    * event AT a left's exact time never matches, so the walk falls back
    * one distinct value) — not the O(events-per-horizon) pair buffer
    * the stream-stream interval join (`clickAttribution`) must hold,
    * and with no watermark coupling: the FIRST right beyond any gap
    * still matches, which an evicting join cannot promise. The price is
    * the ordered-trigger contract on LATE left events (a left arriving
    * after a later-time right was folded into two-long state cannot
    * reconstruct its own horizon — the interval join is the late-data
    * shape). Update mode; state shards by user_id. */
  def streamingAsofWithin(events: Dataset[AsofEvent], leftType: String,
                          rightType: String,
                          toleranceMicros: Long): Dataset[AsofMatch] = {
    require(toleranceMicros >= 0L, s"need tolerance >= 0, got $toleranceMicros")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[AsofEvent], state: GroupState[AsofState]) =>
          val (st, out) = asofWalk(user, it.toSeq, state.getOption,
            leftType, rightType, toleranceMicros)
          state.update(st)
          out.iterator
      }
  }

  /** The shared per-trigger walk: fold the group's (re-sorted) events
    * into the two-long state, emitting one [[AsofMatch]] per left. */
  private def asofWalk(user: Long, arrived: Seq[AsofEvent],
                       prior: Option[AsofState], leftType: String,
                       rightType: String,
                       toleranceMicros: Long): (AsofState, Seq[AsofMatch]) = {
    var st = prior.getOrElse(AsofState(Long.MinValue, Long.MinValue, seen = false))
    val out = Seq.newBuilder[AsofMatch]
    // the trigger's iterator is NOT time-ordered (DebounceStream trap)
    for (e <- arrived.sortBy(e => (e.tus, e.event_id))) {
      if (e.event_type == rightType) {
        if (!st.seen || e.tus > st.vLatest)
          st = AsofState(e.tus,
            if (st.seen) st.vLatest else Long.MinValue, seen = true)
        // e.tus == vLatest: a duplicate time changes nothing
      } else if (e.event_type == leftType) {
        val cand =
          if (st.seen && st.vLatest < e.tus) Some(st.vLatest)
          else if (st.vPrevDistinct != Long.MinValue) Some(st.vPrevDistinct)
          else None
        // c < e.tus re-checked on the FALLBACK arm too: an
        // out-of-contract late left (e.tus ≤ vPrevDistinct) must
        // fail safe to null, never emit a match from the left's
        // FUTURE (e.tus − c would be negative and pass the
        // tolerance bound alone)
        out += AsofMatch(user, e.event_id, e.tus,
          cand.filter(c => c < e.tus && e.tus - c <= toleranceMicros))
      }
    }
    (st, out.result())
  }

  case class AsofEventTs(user_id: Long, event_id: Long, event_type: String,
                         tus: Long, ts: java.sql.Timestamp)

  /** [[streamingAsofWithin]] with EVENT-TIME EVICTION — the bounded-state
    * production shape: a user whose latest right event has aged past
    * `watermark − tolerance` is dropped from the store (event-time
    * timeout). Eviction is SOUND under the operator's own contract: the
    * timeout fires only once the watermark passes `vLatest + tolerance`
    * (+1 ms rounding margin), and the watermark also filters older
    * lefts, so any left the operator still processes satisfies
    * `e.tus − vLatest > tolerance` — its match was stale → null with or
    * without the state. Dropping the state changes no output, it only
    * caps the store at the ACTIVE-user count instead of the ever-seen
    * count (the unbounded variant's price for watermark-free matching).
    * Rights arriving after eviction simply re-seed fresh state — the
    * two-long state only ever serves FUTURE lefts. A user with no right
    * seen stores nothing at all. Same ordered-trigger contract on late
    * lefts; `watermarkDelay` is the lateness the walk tolerates before
    * the filter (and eviction clock) engages. */
  def streamingAsofWithinEvicting(events: Dataset[AsofEvent], leftType: String,
                                  rightType: String, toleranceMicros: Long,
                                  watermarkDelay: String = "0 seconds")
      : Dataset[AsofMatch] = {
    require(toleranceMicros >= 0L, s"need tolerance >= 0, got $toleranceMicros")
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withColumn("ts", timestamp_micros(col("tus")))
      .withWatermark("ts", watermarkDelay)
      .as[AsofEventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[AsofEventTs], state: GroupState[AsofState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (st, out) = asofWalk(user,
              it.map(e => AsofEvent(e.user_id, e.event_id, e.event_type, e.tus)).toSeq,
              state.getOption, leftType, rightType, toleranceMicros)
            if (st.seen) {
              state.update(st)
              // ceil-to-ms + 1 ms margin: never evict EARLY (a boundary
              // left at exactly vLatest + tolerance still matches)
              val evictAtMs = (st.vLatest + toleranceMicros) / 1000L + 2L
              state.setTimeoutTimestamp(
                math.max(evictAtMs, state.getCurrentWatermarkMs + 1L))
            } else if (state.exists) state.remove()
            out.iterator
          }
      }
  }

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserTotals(user_id: Long, events: Long, total: Double)

  /** Running per-user event count + value sum, maintained as explicit
    * state across triggers (KeyValueGroupedDataset.mapGroupsWithState). */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          var n = prev.events
          var tot = prev.total
          it.foreach { e => n += 1; tot += e.value }
          val next = UserTotals(user, n, tot)
          state.update(next)
          next
      }
  }
}
