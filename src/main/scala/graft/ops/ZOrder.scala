package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the multi-dimensional sort key
  * behind data-skipping layouts (Delta/Iceberg OPTIMIZE ZORDER): bit-
  * interleaving two dimensions makes rows close in EITHER dimension
  * land in nearby sort positions, so writing the table sorted by the
  * key gives parquet row groups tight min/max bounds on BOTH columns
  * at once — a range predicate on either dimension prunes row groups,
  * where a plain (a, b) sort only skips on `a`.
  *
  * Pure integer Column combinators (no UDF, no custom expression):
  * each operand is masked to 31 bits and spread with the classic
  * magic-mask doubling sequence (5 shift/mask steps instead of 31
  * per-bit terms), then OR-combined with the second operand shifted
  * left one. 31 bits per dimension keeps the highest occupied bit at
  * position 62, so keys are always non-negative and signed BIGINT
  * ordering IS unsigned Morton ordering — in Spark and in the DuckDB
  * mirror identically. Inputs beyond 31 bits are masked (callers
  * bucket first: day numbers, ids, grid cells all fit). */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spreads the low 31 bits of `c` to the even bit positions. */
  def spread31(c: Column): Column =
    Masks.foldLeft(c.bitwiseAND(lit(0x7FFFFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** Morton key of (a, b): a's bits on even positions, b's on odd. */
  def key(a: Column, b: Column): Column =
    spread31(a).bitwiseOR(shiftleft(spread31(b), 1))

  /** The same spread as DuckDB SQL (for oracle mirrors). */
  def spread31Sql(expr: String): String =
    Masks.foldLeft(s"($expr & 2147483647)") { case (acc, (s, m)) =>
      s"(($acc | ($acc << $s)) & $m)"
    }

  def keySql(a: String, b: String): String =
    s"(${spread31Sql(a)} | (${spread31Sql(b)} << 1))"
}
