package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinnedRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join is row-identical to the theta join, boundaries half-open") {
    val points = Seq((1L, 0.0), (2L, 4.999), (3L, 5.0), (4L, 12.5), (5L, 100.0), (6L, -3.0))
      .toDF("pid", "v").repartition(4)
    val intervals = Seq(("a", 0.0, 5.0), ("b", 5.0, 10.0), ("c", 10.0, 20.0),
      ("d", -10.0, 1.0), ("e", 50.0, 60.0))
      .toDF("band", "lo", "hi")
    val theta = points.join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "band").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    for (w <- Seq(0.5, 1.0, 3.0, 7.0, 100.0)) {
      val binned = BinnedRangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", w)
        .select("pid", "band").collect().map(r => (r.getLong(0), r.getString(1))).sorted
      withClue(s"binWidth=$w: ") { binned shouldBe theta }
    }
    // the fixture exercises: exact lo (in), exact hi (out), negative
    // values, a point in no interval, an interval with no point
    theta.toSeq shouldBe Seq((1L, "a"), (1L, "d"), (2L, "a"), (3L, "b"), (4L, "c"), (6L, "d"))
  }

  test("the interval side explodes to ceil(span/width)+1 bins at most") {
    val iv = Seq(("x", 0.0, 10.0)).toDF("band", "lo", "hi")
    val n = iv.withColumn("_bin",
      explode(sequence(floor(col("lo") / 3.0).cast("long"),
        floor(col("hi") / 3.0).cast("long")))).count()
    n shouldBe 4L // bins 0,1,2,3 for [0,10) at width 3
  }
}
