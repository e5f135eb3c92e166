package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-stage agg equals the direct groupBy on a skewed key") {
    // 10k rows of one hot key + a sprinkle of others
    val rows = Seq.tabulate(10000)(i => ("hot", i.toDouble)) ++
      Seq.tabulate(50)(i => (s"k$i", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy(col("k")).agg(sum("v").as("sum"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = SaltedAgg.sumCount(df, col("k"), col("v"), salts = 8, keyName = "k")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    salted.keySet shouldBe direct.keySet
    for (k <- direct.keys) {
      salted(k)._2 shouldBe direct(k)._2
      math.abs(salted(k)._1 - direct(k)._1) should be <= 1e-9 * math.max(1.0, math.abs(direct(k)._1))
    }
  }

  test("the salted first stage actually splits the hot key across groups") {
    val df = Seq.tabulate(1000)(i => ("hot", 1.0)).toDF("k", "v").repartition(8)
    val partials = df
      .groupBy(col("k"), pmod(spark_partition_id(), lit(8)).as("_salt"))
      .agg(count(lit(1))).count()
    partials should be > 1L // hot key spread over multiple salted groups
  }
}
