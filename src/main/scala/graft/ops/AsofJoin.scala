package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose time
  * is STRICTLY before the left row's time, within equal keys. Spark has
  * no native as-of operator (Pandas `merge_asof` / DuckDB `ASOF JOIN`
  * territory), and the naive formulation is a range theta-join that
  * Catalyst plans as a per-key cartesian product — O(L·R) per key.
  *
  * Spark-first formulation instead: UNION the two sides, window over the
  * key ordered by (time, side), and carry the last seen right-side value
  * forward with `last(_, ignoreNulls)`. One hash shuffle on the key +
  * one sort — O((L+R) log (L+R)) per partition, no pair blowup, skew
  * bounded by the hottest key exactly like any window function. At 100 TB
  * this is the only formulation that survives: the pair space of a range
  * join over a hot key is quadratic, while the union-window is linear in
  * rows after the sort.
  *
  * Strictness: right rows sort AFTER left rows at equal time (side flag
  * is the final sort key), and the frame ends at the PREVIOUS row, so a
  * right row at exactly t never matches a left row at t — "latest right
  * strictly before", matching DuckDB's `ASOF JOIN ... ON l.t > r.t`.
  */
object AsofJoin {

  /** @param left     probe side (every left row appears in the output,
    *                 including null-key rows, which get null asof values)
    * @param right    reference side (its `valueCols` are attached);
    *                 null-key right rows are dropped — SQL equality
    *                 semantics, matching the DuckDB `l.key = r.key`
    *                 mirror, where NULL never matches (the window
    *                 formulation would otherwise group null keys
    *                 together and leak a null-key right row's values
    *                 onto null-key left rows)
    * @param keys     equi-join keys present on both sides
    * @param timeCol  ordering column name present on both sides (numeric
    *                 or timestamp; must be orderable)
    * @param valueCols right-side columns to carry onto matching left rows
    *                 (null when no right row precedes the left row). All
    *                 values come from the SAME matched right row: they
    *                 travel as one struct through one `last(_,
    *                 ignoreNulls)` — per-column lasts would each skip
    *                 nulls independently and could stitch values from
    *                 different right rows
    * @param tieBreak extra right-side ordering columns — when several
    *                 right rows share (keys, time), the LAST one in this
    *                 ordering wins (deterministic output needs a unique
    *                 tie-break, e.g. an event id)
    */
  def lastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                 timeCol: String, valueCols: Seq[String],
                 tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val leftCols = left.columns.toSeq
    val outValue = valueCols.map(v => s"asof_$v")
    val valueStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    // union layout: keys ++ time ++ side ++ tieBreak ++ value struct ++ leftCols
    val lSide = left.select(
      keys.map(col) ++ Seq(col(timeCol).as("_t"), lit(0).as("_side")) ++
        tieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"_tb_$c")) ++
        Seq(lit(null).cast(valueStructType).as("_v")) ++
        leftCols.map(c => col(c).as(s"_l_$c")): _*)
    val rSide = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(col(timeCol).as("_t"), lit(1).as("_side")) ++
          tieBreak.map(c => col(c).as(s"_tb_$c")) ++
          Seq(struct(valueCols.map(c => col(c).as(c)): _*).as("_v")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)

    // right rows sort after left rows at equal _t => the "previous row"
    // frame never exposes a same-time right row to a left row
    val order: Seq[Column] =
      col("_t") +: col("_side") +: tieBreak.map(c => col(s"_tb_$c"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)

    lSide.unionByName(rSide)
      .select((keys.map(col) :+ col("_side") :+ col("_t")) ++
        leftCols.filterNot(keys.contains).map(c => col(s"_l_$c")) :+
        last(col("_v"), ignoreNulls = true).over(w).as("_vlast"): _*)
      .filter(col("_side") === 0)
      .select(leftCols.map(c => if (keys.contains(c)) col(c) else col(s"_l_$c").as(c)) ++
        valueCols.zip(outValue).map { case (c, out) => col("_vlast")(c).as(out) }: _*)
  }

  /** Tolerance-bounded as-of — [[lastBefore]] with a maximum lookback
    * (pandas `merge_asof(tolerance=…)`): the matched right row only
    * counts when it lies within `tolerance` time units strictly before
    * the left row; staler matches null out, exactly as if no right row
    * preceded. The attribution use case: a click joins its prior view
    * only within the campaign horizon. Implemented as ONE [[lastBefore]]
    * pass carrying the matched right TIME through the same struct (so
    * the staleness test reads the very row that matched, never a
    * different one) + a codegen'd post-projection — the tolerance adds
    * zero shuffles. `timeCol` must be numeric (BIGINT micros here;
    * timestamps cast upstream). */
  def lastBeforeWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       timeCol: String, valueCols: Seq[String],
                       tolerance: Long,
                       tieBreak: Seq[String] = Nil): DataFrame = {
    require(tolerance >= 0, s"need tolerance >= 0, got $tolerance")
    val rt = "_asof_rt"
    val joined = lastBefore(left,
      right.withColumn(rt, col(timeCol)), keys, timeCol,
      valueCols :+ rt, tieBreak)
    val fresh = col(s"asof_$rt").isNotNull &&
      (col(timeCol) - col(s"asof_$rt")) <= tolerance
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }.drop(s"asof_$rt")
  }

  /** Forward as-of join — [[lastBefore]] mirrored in time: each left
    * row gets the EARLIEST right row whose time is STRICTLY AFTER its
    * own (pandas `merge_asof(direction='forward')`; the "next reading
    * after the event" question). Same union-window shape and scale
    * story — one key exchange, one sort, no range-join pair blowup.
    *
    * Strictness mirror: right rows sort BEFORE left rows at equal time
    * and the frame starts at the NEXT row, so a right row at exactly t
    * never matches a left row at t. When several right rows share
    * (keys, time), the FIRST in `tieBreak` ascending order wins. */
  def firstAfter(left: DataFrame, right: DataFrame, keys: Seq[String],
                 timeCol: String, valueCols: Seq[String],
                 tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val leftCols = left.columns.toSeq
    val outValue = valueCols.map(v => s"asof_$v")
    val valueStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    val lSide = left.select(
      keys.map(col) ++ Seq(col(timeCol).as("_t"), lit(1).as("_side")) ++
        tieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"_tb_$c")) ++
        Seq(lit(null).cast(valueStructType).as("_v")) ++
        leftCols.map(c => col(c).as(s"_l_$c")): _*)
    val rSide = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(col(timeCol).as("_t"), lit(0).as("_side")) ++
          tieBreak.map(c => col(c).as(s"_tb_$c")) ++
          Seq(struct(valueCols.map(c => col(c).as(c)): _*).as("_v")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)

    // right rows sort BEFORE left rows at equal _t => the "following
    // rows" frame never exposes a same-time right row to a left row
    val order: Seq[Column] =
      col("_t") +: col("_side") +: tieBreak.map(c => col(s"_tb_$c"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(1, Window.unboundedFollowing)

    lSide.unionByName(rSide)
      .select((keys.map(col) :+ col("_side") :+ col("_t")) ++
        leftCols.filterNot(keys.contains).map(c => col(s"_l_$c")) :+
        first(col("_v"), ignoreNulls = true).over(w).as("_vfirst"): _*)
      .filter(col("_side") === 1)
      .select(leftCols.map(c => if (keys.contains(c)) col(c) else col(s"_l_$c").as(c)) ++
        valueCols.zip(outValue).map { case (c, out) => col("_vfirst")(c).as(out) }: _*)
  }
}
