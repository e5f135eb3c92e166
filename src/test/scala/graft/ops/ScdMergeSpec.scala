package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdMergeSpec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: (Long, String, Long, Long, Option[Long], Boolean)*) =
    rows.toDF("key", "seg", "nat", "valid_from", "valid_to", "is_current")

  test("SCD2 merge: close+insert on change, pass-through on match, insert on new key, closed history untouched") {
    val history = hist(
      // key 1: one closed + one open row; the change matches the OPEN attrs
      (1L, "A_old", 7L, 0L, Some(5L), false),
      (1L, "A", 7L, 5L, None, true),
      // key 2: open row, change differs -> close + insert
      (2L, "B", 8L, 0L, None, true),
      // key 3: open row, key absent from the change set -> untouched
      (3L, "C", 9L, 0L, None, true))
    val changes = Seq(
      (1L, "A", 7L),      // identical attrs: no-op
      (2L, "B2", 8L),     // changed attr
      (4L, "D", 10L))     // brand-new key
      .toDF("key", "seg", "nat")
    val out = ScdMerge.merge(history, changes, "key", Seq("seg", "nat"), version = 10L)
      .orderBy("key", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    out shouldBe Array(
      (1L, "A_old", 7L, 0L, Some(5L), false),
      (1L, "A", 7L, 5L, None, true),
      (2L, "B", 8L, 0L, Some(10L), false),
      (2L, "B2", 8L, 10L, None, true),
      (3L, "C", 9L, 0L, None, true),
      (4L, "D", 10L, 10L, None, true))
  }

  test("attr comparison is null-safe: null == null is a no-op, null vs value is a change") {
    val history = Seq(
      (1L, Option.empty[String], 0L, Option.empty[Long], true),
      (2L, Option("X"), 0L, Option.empty[Long], true))
      .toDF("key", "seg", "valid_from", "valid_to", "is_current")
    val changes = Seq(
      (1L, Option.empty[String]),  // null == null: pass through
      (2L, Option.empty[String]))  // X -> null: a real change
      .toDF("key", "seg")
    val out = ScdMerge.merge(history, changes, "key", Seq("seg"), version = 3L)
      .orderBy("key", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    out shouldBe Array(
      (1L, None, 0L, None, true),
      (2L, Some("X"), 0L, Some(3L), false),
      (2L, None, 3L, None, true))
  }

  test("SCD2 invariant preserved: at most one open row per key after iterated merges") {
    val v0 = Seq((1L, "a", 0L, Option.empty[Long], true))
      .toDF("key", "seg", "valid_from", "valid_to", "is_current")
    val m1 = ScdMerge.merge(v0, Seq((1L, "b"), (2L, "x")).toDF("key", "seg"),
      "key", Seq("seg"), version = 1L)
    val m2 = ScdMerge.merge(m1, Seq((1L, "c"), (2L, "x")).toDF("key", "seg"),
      "key", Seq("seg"), version = 2L)
    val open = m2.filter(col("is_current")).groupBy("key").count().collect()
    open.foreach(_.getLong(1) shouldBe 1L)
    m2.count() shouldBe 4L // key1: a(closed) b(closed) c(open); key2: x(open)
    // every closed row's valid_to equals the successor's valid_from
    val k1 = m2.filter(col("key") === 1L).orderBy("valid_from").collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    k1 shouldBe Array(("a", 0L, 1L), ("b", 1L, 2L), ("c", 2L, -1L))
  }

  test("all-closed key: a change inserts a fresh open row exactly once, closed rows untouched") {
    // externally-authored history: key 1 has TWO closed rows and no open
    // row (the state merge/fromChangeLog never produce but must survive)
    val history = hist(
      (1L, "a", 7L, 0L, Some(3L), false),
      (1L, "b", 7L, 3L, Some(5L), false),
      (2L, "z", 9L, 0L, None, true))
    val changes = Seq((1L, "c", 7L), (2L, "z", 9L)).toDF("key", "seg", "nat")
    val out = ScdMerge.merge(history, changes, "key", Seq("seg", "nat"), version = 8L)
      .orderBy("key", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    out shouldBe Array(
      (1L, "a", 0L, Some(3L), false),   // closed rows pass through
      (1L, "b", 3L, Some(5L), false),
      (1L, "c", 8L, None, true),        // the insert emits ONCE, not per closed row
      (2L, "z", 0L, None, true))        // no-op open key untouched
    // and an all-closed key ABSENT from the change set stays all closed
    val quiet = ScdMerge.merge(history, Seq((2L, "y", 9L)).toDF("key", "seg", "nat"),
      "key", Seq("seg", "nat"), version = 8L)
    quiet.filter(col("key") === 1L && col("is_current")).count() shouldBe 0L
    quiet.filter(col("key") === 1L).count() shouldBe 2L
  }

  test("pointInTime: inclusive at valid_from, latest version wins, null before first version and for unknown keys") {
    val history = hist(
      (1L, "a", 7L, 0L, Some(5L), false),
      (1L, "b", 8L, 5L, None, true),
      (2L, "z", 9L, 3L, None, true))
    val facts = Seq((1L, 0L), (1L, 4L), (1L, 5L), (1L, 99L), (2L, 2L), (3L, 7L))
      .toDF("key", "t")
    val out = ScdMerge.pointInTime(history, facts, "key", "t", Seq("seg", "nat"))
      .orderBy("key", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    out shouldBe Array(
      (1L, 0L, Some("a"), Some(7L)),  // t = valid_from: inclusive
      (1L, 4L, Some("a"), Some(7L)),
      (1L, 5L, Some("b"), Some(8L)),  // boundary flips to the new version
      (1L, 99L, Some("b"), Some(8L)),
      (2L, 2L, None, None),           // before the key's first version
      (3L, 7L, None, None))           // unknown key: kept, null attrs
  }

  test("fromChangeLog: consecutive no-ops collapse, intervals chain, null attrs on the first version survive") {
    val log = Seq(
      (1L, Option("a"), 0L), (1L, Option("a"), 3L),  // no-op at v3: dropped
      (1L, Option("b"), 5L), (1L, Option("b"), 7L),  // no-op at v7
      (1L, Option("a"), 9L),                          // back to 'a': a NEW version
      (2L, Option.empty[String], 1L),                 // first version with a NULL attr
      (2L, Option.empty[String], 4L),                 // null == null: no-op
      (2L, Option("x"), 6L))
      .toDF("key", "seg", "v")
    val out = ScdMerge.fromChangeLog(log, "key", Seq("seg"), "v")
      .orderBy("key", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    out shouldBe Array(
      (1L, Some("a"), 0L, Some(5L), false),
      (1L, Some("b"), 5L, Some(9L), false),
      (1L, Some("a"), 9L, None, true),
      (2L, None, 1L, Some(6L), false),
      (2L, Some("x"), 6L, None, true))
  }

  test("history is scanned once through a single full-outer merge join") {
    val history = spark.range(0, 1000)
      .select(col("id").as("key"), concat(lit("s"), col("id") % 5).as("seg"),
        lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    val changes = Seq((1L, "zz"), (5000L, "new")).toDF("key", "seg")
    val plan = ScdMerge.merge(history, changes, "key", Seq("seg"), 7L)
      .queryExecution.executedPlan.toString
    // the MERGE shape: one full-outer sort-merge join (full outer has no
    // broadcast variant), history's Range appearing exactly once — closed
    // rows ride through the join, not around it via a second scan
    plan should include("SortMergeJoin")
    plan should include("FullOuter")
    plan.sliding("Range (0".length).count(_ == "Range (0") shouldBe 1
  }
}
