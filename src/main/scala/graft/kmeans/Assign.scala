package graft.kmeans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P2 (Euclidean distance) + P3 (nearest-centroid argmin).
  *
  * The reference computes, per point, a linear scan over K broadcast
  * centroids tracking the min distance (reference `Task1.java:36-54`).
  * Spark-native form: a single codegen'd column expression — an array of
  * `struct(distance, index)` candidates reduced with `array_min`, whose
  * struct ordering (first field, then second) yields min-distance with
  * lowest-index tie-break, exactly the reference's strict `<` semantics
  * (reference `Task1.java:47-50`). No UDF, no shuffle; stays inside
  * whole-stage codegen and scales linearly with input.
  */
object Assign {

  /** P2: Euclidean distance from a point column triple to a fixed centroid.
    * Uses `pow(_, 2)` (= `java.lang.Math.pow`) to match the reference
    * formula bit-for-bit (reference `Task1.java:42`).
    */
  def dist(x: Column, y: Column, z: Column, c: Point): Column =
    sqrt(pow(x - c.x, 2) + pow(y - c.y, 2) + pow(z - c.z, 2))

  /** P3: index of the nearest centroid (0-based), ties to lowest index. */
  def nearestCentroid(centroids: Seq[Point], x: Column, y: Column, z: Column): Column = {
    require(centroids.nonEmpty, "no centroids")
    val candidates = centroids.zipWithIndex.map { case (c, i) =>
      struct(dist(x, y, z, c).as("d"), lit(i).as("idx"))
    }
    array_min(array(candidates: _*)).getField("idx")
  }

  /** Adds an integer `cluster` column to a DataFrame with x,y,z columns. */
  def assign(points: DataFrame, centroids: Seq[Point]): DataFrame =
    points.withColumn("cluster", nearestCentroid(centroids, col("x"), col("y"), col("z")))
}
