package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch analytics over the events shape (user_id, event_type, tus
  * epoch-micros) — funnel and cohort retention. These are BATCH
  * operators (funnel folds to a K-row driver result; retention joins a
  * distinct activity grid), so they live here rather than in
  * `graft.streaming`: the streaming-capable funnel twin is
  * `EventStream.funnelStageUpdates`, which maintains per-user stage
  * progress as explicit state and works on unbounded streams.
  */
object Analytics {

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
}
