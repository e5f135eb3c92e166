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
