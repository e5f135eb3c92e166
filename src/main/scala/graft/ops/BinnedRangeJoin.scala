package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale path for point-in-interval (range) joins. The broadcast
  * nested-loop theta join (`q_range_join`) is right when the interval
  * side is a handful of literal bands; with MANY intervals it degrades
  * to |points|·|intervals| comparisons. Binning reformulates the range
  * predicate as an EQUI join: each interval [lo, hi) explodes to the
  * integer bins it overlaps, each point maps to its single bin, the
  * join keys on the bin id, and the exact predicate filters the
  * candidates. Candidate volume is |points| · (intervals overlapping
  * each point's bin) — local, never the full cross product — and the
  * equi join shuffles/broadcasts like any other join, so AQE, skew
  * handling, and bucketing all apply.
  *
  * `binWidth` trades interval-side explode factor (≈ interval span /
  * binWidth rows per interval) against candidate precision (points
  * compare only against intervals sharing their bin). An interval
  * whose `hi` lands exactly on a bin boundary emits that final bin as
  * a harmless false candidate (the exact filter drops it) — cheaper
  * than branching on divisibility.
  */
object BinnedRangeJoin {

  /** Inner join of `points` (value column `pointCol`) against
    * `intervals` ([`loCol`, `hiCol`) half-open), returning the matched
    * rows with all columns of both inputs. Column names must not
    * collide across the two inputs. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"need binWidth > 0, got $binWidth")
    // the internal bin key must not clobber caller data
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "pointInInterval: inputs must not carry a '_bin' column")
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    points.withColumn("_bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(iv, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}
