package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: latest right row with rt < lt per key,
    * ties on rt broken by the largest tie-break value. */
  private def bruteForce(left: Seq[(Long, Long)], right: Seq[(Long, Long, Long)])
  : Map[(Long, Long), Option[Long]] =
    left.map { case (k, lt) =>
      val prior = right.filter { case (rk, rt, _) => rk == k && rt < lt }
      (k, lt) -> prior.sortBy { case (_, rt, tb) => (rt, tb) }.lastOption.map(_._3)
    }.toMap

  test("lastBefore matches the brute-force as-of semantics, incl. equal-time strictness") {
    // deterministic pseudo-random layout with deliberate time collisions
    val left = for (k <- 0L until 5L; i <- 0L until 20L)
      yield (k, (i * 7 + k * 3) % 40)
    val right = for (k <- 0L until 5L; i <- 0L until 15L)
      yield (k, (i * 5 + k) % 40, 1000 + k * 100 + i)
    val l = left.toDF("user_id", "t")
    val r = right.toDF("user_id", "t", "val")

    val got = AsofJoin.lastBefore(l, r, keys = Seq("user_id"), timeCol = "t",
      valueCols = Seq("val"), tieBreak = Seq("val"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1)) ->
        (if (row.isNullAt(2)) None else Some(row.getLong(2))))
      .toMap

    got shouldBe bruteForce(left, right)
  }

  test("a right row at exactly the left time is NOT matched (strictly before)") {
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 100L, 7L), (1L, 99L, 3L)).toDF("k", "t", "v")
    val out = AsofJoin.lastBefore(l, r, Seq("k"), "t", Seq("v")).collect()
    out.length shouldBe 1
    out.head.getLong(2) shouldBe 3L // the t=100 row is invisible
  }

  test("left rows with no prior right row keep null values") {
    val l = Seq((1L, 5L), (2L, 50L)).toDF("k", "t")
    val r = Seq((2L, 10L, 42L)).toDF("k", "t", "v")
    val got = AsofJoin.lastBefore(l, r, Seq("k"), "t", Seq("v"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(2)) None else Some(x.getLong(2)))).toMap
    got shouldBe Map(1L -> None, 2L -> Some(42L))
  }

  test("null join keys follow SQL equality: right nulls never match, left nulls get null") {
    val l = Seq((Option(1L), 10L), (Option.empty[Long], 10L)).toDF("k", "t")
    val r = Seq((Option(1L), 5L, 7L), (Option.empty[Long], 5L, 99L)).toDF("k", "t", "v")
    val got = AsofJoin.lastBefore(l, r, Seq("k"), "t", Seq("v"))
      .collect()
      .map(x => (if (x.isNullAt(0)) None else Some(x.getLong(0))) ->
        (if (x.isNullAt(2)) None else Some(x.getLong(2)))).toMap
    // the null-key right row (v=99) must never leak onto the null-key left row
    got shouldBe Map(Some(1L) -> Some(7L), None -> None)
  }

  test("multiple valueCols all come from the SAME matched right row") {
    val l = Seq((1L, 100L)).toDF("k", "t")
    // latest prior right row (t=90) has a NULL in v2: a per-column last()
    // would skip it and stitch v2 from the older t=80 row — the struct
    // carry must return (b, null), both from t=90
    val r = Seq((1L, 80L, "a", Option(10L)), (1L, 90L, "b", Option.empty[Long]))
      .toDF("k", "t", "v1", "v2")
    val out = AsofJoin.lastBefore(l, r, Seq("k"), "t", Seq("v1", "v2")).collect().head
    out.getString(2) shouldBe "b"
    out.isNullAt(3) shouldBe true
  }

  test("plan is a single window over one shuffle, never a range join") {
    val l = Seq((1L, 5L)).toDF("k", "t")
    val r = Seq((1L, 3L, 9L)).toDF("k", "t", "v")
    val plan = AsofJoin.lastBefore(l, r, Seq("k"), "t", Seq("v"))
      .queryExecution.executedPlan.toString()
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("Window")
  }

  test("lastBeforeWithin: a stale latest match nulls out — no fallback to older in-horizon rows") {
    val l = Seq((1L, 100L), (2L, 100L), (3L, 100L)).toDF("k", "t")
    val r = Seq(
      (1L, 95L, 10L),             // fresh: within 10
      (2L, 80L, 20L),             // stale latest: 20 units back
      (3L, 99L, 30L), (3L, 50L, 31L)) // latest fresh; the old row is irrelevant
      .toDF("k", "t", "v")
    val got = AsofJoin.lastBeforeWithin(l, r, Seq("k"), "t", Seq("v"),
        tolerance = 10L)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(2)) None else Some(x.getLong(2)))).toMap
    got shouldBe Map(1L -> Some(10L), 2L -> None, 3L -> Some(30L))
    // the matched-row test reads the LATEST row (the freshest by
    // construction): 95 is 5 units back, tolerance 4 nulls the join even
    // though other (necessarily staler) rows exist
    val l2 = Seq((9L, 100L)).toDF("k", "t")
    val r2 = Seq((9L, 80L, 1L), (9L, 95L, 2L)).toDF("k", "t", "v")
    AsofJoin.lastBeforeWithin(l2, r2, Seq("k"), "t", Seq("v"), tolerance = 4L)
      .collect().head.isNullAt(2) shouldBe true
    // ... and exactly at the tolerance boundary it still matches (<=)
    AsofJoin.lastBeforeWithin(l2, r2, Seq("k"), "t", Seq("v"), tolerance = 5L)
      .collect().head.getLong(2) shouldBe 2L
  }

  /** Forward brute-force: earliest right row with rt > lt per key, ties
    * on rt broken by the SMALLEST tie-break value. */
  private def bruteForward(left: Seq[(Long, Long)], right: Seq[(Long, Long, Long)])
  : Map[(Long, Long), Option[Long]] =
    left.map { case (k, lt) =>
      val after = right.filter { case (rk, rt, _) => rk == k && rt > lt }
      (k, lt) -> after.sortBy { case (_, rt, tb) => (rt, tb) }.headOption.map(_._3)
    }.toMap

  test("firstAfter matches the forward brute-force semantics, incl. equal-time strictness and first-tie-wins") {
    val left = for (k <- 0L until 5L; i <- 0L until 20L)
      yield (k, (i * 7 + k * 3) % 40)
    val right = for (k <- 0L until 5L; i <- 0L until 15L)
      yield (k, (i * 5 + k) % 40, 1000 + k * 100 + i)
    val got = AsofJoin.firstAfter(left.toDF("user_id", "t"),
        right.toDF("user_id", "t", "val"),
        keys = Seq("user_id"), timeCol = "t",
        valueCols = Seq("val"), tieBreak = Seq("val"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1)) ->
        (if (row.isNullAt(2)) None else Some(row.getLong(2))))
      .toMap
    got shouldBe bruteForward(left, right)
    // equal-time strictness mirrored: t=100 right row invisible
    val out = AsofJoin.firstAfter(
      Seq((1L, 100L)).toDF("k", "t"),
      Seq((1L, 100L, 7L), (1L, 101L, 3L)).toDF("k", "t", "v"),
      Seq("k"), "t", Seq("v")).collect()
    out.head.getLong(2) shouldBe 3L
    // and the window plan holds — no range-join pair blowup
    val plan = AsofJoin.firstAfter(
        Seq((1L, 1L)).toDF("k", "t"), Seq((1L, 2L, 9L)).toDF("k", "t", "v"),
        Seq("k"), "t", Seq("v"))
      .queryExecution.executedPlan.toString()
    plan should not include "CartesianProduct"
    plan should include("Window")
  }
}
