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
    * per-user and shuffles once. */
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

  /** Ordered funnel analysis: how many users reach each stage of
    * `stages` IN ORDER (stage i+1 counts only if it happens strictly
    * after the user's first stage-i event). One hash aggregate computes
    * every user's first time per stage (map-side partial min), a second
    * tiny aggregate folds the stage predicates — no joins, no windows,
    * no per-stage passes; cost is one scan + one user-keyed shuffle at
    * any scale. Input needs (user_id, event_type, tus). Output: one row
    * per stage prefix: (stage, event_type, n_users). */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val firstCols = stages.map(st =>
      min(when(col("event_type") === st, col("tus"))).as(s"t_$st"))
    val firsts = events
      .groupBy(col("user_id"))
      .agg(firstCols.head, firstCols.tail: _*)
    // reached(i): every t_0..t_i non-null and strictly increasing
    val reached = stages.indices.map { i =>
      (0 to i).map(j => col(s"t_${stages(j)}").isNotNull)
        .reduce(_ && _) &&
        (1 to i).map(j => col(s"t_${stages(j - 1)}") < col(s"t_${stages(j)}"))
          .reduceOption(_ && _).getOrElse(lit(true))
    }
    val agg = firsts.agg(
      count(when(reached.head, 1)).as("s0"),
      reached.tail.zipWithIndex.map { case (c, i) => count(when(c, 1)).as(s"s${i + 1}") }: _*)
    val spark = events.sparkSession
    import spark.implicits._
    val row = agg.collect().head
    stages.zipWithIndex
      .map { case (st, i) => (i.toLong, st, row.getLong(i)) }
      .toDF("stage", "event_type", "n_users")
  }

  /** Hour-cohort retention: users grouped by their FIRST-seen hour
    * (cohort), counted by how many distinct later hours they came back
    * in. The standard growth-analytics matrix, shaped for scale: first
    * hour and the per-(user, hour) activity grid are two hash
    * aggregates; the cohort join keys on user_id only. Input needs
    * (user_id, tus). Output: (cohort_hour, offset_hours, n_users) with
    * offset 0 = the cohort's own hour. */
  def retention(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000 * 1000
    // integer `div`, not double division + cast: bit-identical to the
    // oracle's `//` with no float quotient anywhere
    val hours = events.select(col("user_id"), expr(s"tus div $hourUs").as("hour"))
    val active = hours.distinct()
    val cohorts = hours.groupBy(col("user_id")).agg(min("hour").as("cohort_hour"))
    active.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_hour"), (col("hour") - col("cohort_hour")).as("offset_hours"))
      .agg(countDistinct(col("user_id")).as("n_users"))
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
