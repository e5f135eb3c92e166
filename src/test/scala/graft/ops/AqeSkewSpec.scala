package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the runtime skew remedy the engine relies on at scale: AQE
  * detecting an oversized shuffle partition in a sort-merge join and
  * splitting it (the complement of the compile-time salting in
  * ops/SaltedAgg — joins get skew handling for free from AQE, so the
  * engine deliberately does NOT hand-salt join keys). */
class AqeSkewSpec extends SparkSpec {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 95% of left rows share one key; right side is uniform
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
          col("id").as("payload"))
      val right = spark.range(50).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // collect() executes joined's OWN QueryExecution (count() would wrap
      // it in a new aggregate plan, leaving this one un-executed and its
      // AQE plan never finalized — skew=true only appears after execution)
      joined.collect().length shouldBe 200000
      val finalPlan = joined.queryExecution.executedPlan.toString()
      finalPlan should include("isFinalPlan=true")
      finalPlan should include("skew=true")
    }
  }

  test("stratifiedSample under a hot stratum: map-side WindowGroupLimit caps the skew") {
    // one language holds 99.95% of the corpus — the per-lang window
    // would put all of it in one task IF every row reached the shuffle.
    // WindowGroupLimit's Partial mode trims each map partition to
    // perGroup rows per stratum BEFORE the exchange, so the hot task
    // sorts O(perGroup x mappers), not O(hot-stratum) — that partial
    // step existing in the executed plan is the skew-safety contract.
    import spark.implicits._
    val perGroup = 5
    val docs = spark.range(20000)
      .select(col("id").as("doc_id"),
        concat(lit("text body number "), col("id")).as("text"),
        when(col("id") < 10, lit("cold")).otherwise(lit("hot")).as("lang"))
      .repartition(8)
    val out = graft.llm.TextAnalysis.stratifiedSample(docs, perGroup)
    val rows = out.collect()
    rows.length shouldBe 2 * perGroup
    rows.count(_.getString(0) == "hot") shouldBe perGroup
    rows.count(_.getString(0) == "cold") shouldBe perGroup
    val plan = out.queryExecution.executedPlan.toString()
    val wgl = plan.linesIterator.filter(_.contains("WindowGroupLimit")).toSeq
    // both the map-side (Partial) trim and the post-shuffle (Final) trim
    wgl.exists(_.contains("Partial")) shouldBe true
    wgl.exists(_.contains("Final")) shouldBe true
  }
}
