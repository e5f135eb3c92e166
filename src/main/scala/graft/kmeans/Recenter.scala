package graft.kmeans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1/A2: per-cluster mean re-centering.
  *
  * Reference: reducer sums x,y,z and counts per cluster key, emits
  * `sum/count` per axis (reference `Task1.java:82-99`). The combiner
  * variant re-registers the same code as a combiner, emitting a partial
  * MEAN (reference `Task4.java:117-134,190`) — mathematically wrong for
  * unequal partial-group sizes; it only matched because the committed runs
  * used a single input split. We deliberately implement the correct
  * (sum, count) partial-aggregation semantics, which Spark's
  * HashAggregate partial/final split performs automatically for
  * `sum`/`count`; this agrees with every committed golden output
  * (task3 ≡ task4 final centroids, byte-identical).
  *
  * A cluster that receives no points simply does not appear in the output
  * (the reference's behavior: absent key row — K shrinks).
  */
object Recenter {

  /** `assigned` must have columns x, y, z, cluster. Returns one row per
    * non-empty cluster: (cluster, x, y, z) where x,y,z is the member mean.
    *
    * Floating-point caveat: partial sums combine in partition order, so
    * results agree with the single-reducer reference only to ~1e-12
    * relative unless the input is a single partition. Golden-parity tests
    * must either `coalesce(1)` the input or compare with tolerance;
    * multi-partition byte parity is NOT guaranteed. */
  def recenter(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cluster")).agg(
      (sum("x") / count(lit(1))).as("x"),
      (sum("y") / count(lit(1))).as("y"),
      (sum("z") / count(lit(1))).as("z"))
}
