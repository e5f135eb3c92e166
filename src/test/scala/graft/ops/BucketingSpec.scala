package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(k: String, v: String)(body: => Unit): Unit = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }

  test("join of two co-bucketed tables runs with NO exchange") {
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", Seq("k"), buckets = 4)
    Bucketing.writeBucketed(b, "bkt_b", Seq("k"), buckets = 4)
    try withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = Bucketing.readBucketed(spark, "bkt_a")
        .join(Bucketing.readBucketed(spark, "bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString()
      (plan should not).include("Exchange hashpartitioning")
      joined.count() shouldBe 1000L
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val a = (1L to 100L).map(i => (i % 10, i.toDouble)).toDF("k", "v")
    Bucketing.writeBucketed(a, "bkt_agg", Seq("k"), buckets = 4)
    try {
      val agg = Bucketing.readBucketed(spark, "bkt_agg")
        .groupBy(col("k")).agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString()
      (plan should not).include("Exchange hashpartitioning")
      agg.count() shouldBe 10L
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }
}
