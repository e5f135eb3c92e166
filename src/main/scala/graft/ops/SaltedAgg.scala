package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-stage aggregation. A single hot key funnels all
  * its rows through one reducer in a plain groupBy; salting spreads the
  * hot key over `salts` partial groups first, then merges the (tiny)
  * partials. Exact for algebraic aggregates — the partials are
  * (sum, count), merged by addition, the same decomposition Spark's own
  * partial aggregation uses (and the reference's combiner got wrong,
  * see Recenter).
  *
  * The salt is derived from spark_partition_id(): deterministic for a
  * given partitioning, free (no rand()), and spreads any key that spans
  * multiple input partitions — which is exactly when skew hurts.
  */
object SaltedAgg {

  /** groupBy(key).agg(sum(value), count(*)) with a salted first stage.
    * Output columns: key (as `keyName`), `sum`, `n`. */
  def sumCount(df: DataFrame, key: Column, value: Column, salts: Int,
               keyName: String = "key"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    df.groupBy(key.as(keyName), pmod(spark_partition_id(), lit(salts)).as("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col(keyName))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pn")).as("n"))
  }
}
