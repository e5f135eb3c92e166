package graft

import org.apache.spark.sql.functions._

/** Pins the semantics of the round-6 SQL-breadth contract queries that
  * have no operator object of their own: correlated scalar subqueries
  * (Catalyst decorrelation, including the COUNT-over-empty-group
  * "count bug") and value-based RANGE window frames.
  */
class SqlBreadthSpec extends SparkSpec {
  import spark.implicits._

  test("correlated scalar count subquery yields 0 (not null) for empty groups") {
    Seq((1L, 10.0), (1L, 30.0), (3L, 5.0))
      .toDF("o_custkey", "o_totalprice").createOrReplaceTempView("sq_orders")
    Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L))
      .toDF("c_custkey").createOrReplaceTempView("sq_customer")
    val out = spark.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM sq_orders WHERE o_custkey = c_custkey) AS n_orders,
        |  (SELECT round(max(o_totalprice), 2) FROM sq_orders WHERE o_custkey = c_custkey) AS max_price
        |FROM sq_customer ORDER BY c_custkey""".stripMargin).collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(2L, 0L, 1L) // count bug: 0, never null
    out(1).isNullAt(2) shouldBe true                     // max over empty IS null
    out(0).getDouble(2) shouldBe 30.0
    // decorrelation happened: the optimized plan contains no subquery node
    val plan = spark.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM sq_orders WHERE o_custkey = c_custkey) AS n
        |FROM sq_customer""".stripMargin).queryExecution.optimizedPlan.toString
    plan should not include "scalar-subquery"
  }

  test("RANGE frame windows by value: peers merge, gaps excluded") {
    // user 1: events at 0min, 30min, 90min — trailing-1h frames:
    //   e1 sees {e1}; e2 sees {e1,e2}; e3 sees {e2,e3} (e1 out of range)
    // duplicate timestamps (user 2) are peers: both rows see both
    val ev = Seq(
      (1L, 1L, 0L, 1.0), (2L, 1L, 1800000000L, 2.0), (3L, 1L, 5400000000L, 4.0),
      (4L, 2L, 100L, 8.0), (5L, 2L, 100L, 16.0))
      .toDF("event_id", "user_id", "tus", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-3600000000L, 0)
    val out = ev.select(col("event_id"),
        count(lit(1)).over(w).as("n"), sum(col("value")).over(w).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    out.toSeq shouldBe Seq(
      (1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 2L, 6.0),
      (4L, 2L, 24.0), (5L, 2L, 24.0))
  }
}
