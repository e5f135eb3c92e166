package graft.kmeans

import graft.SparkSpec
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler

/** Sanity cross-check against MLlib (SURVEY §7 extension): our converged
  * clustering on the reference dataset should be at least as good as
  * MLlib's KMeans at the same K, measured by within-cluster SSE. Not a
  * parity test — MLlib uses different init/stopping — just a guard that
  * the engine's clustering quality is in the library's league. */
class MLlibCrossCheckSpec extends SparkSpec {

  test("converged SSE is within 10% of MLlib KMeans on the reference data") {
    val pts = Points.readCsv(spark, s"$ref/3d_points_dataset.csv").cache()
    val seeds = Points.readSeeds(s"$ref/seed_points_K5.csv")
    val r = KMeansRunner.converge(pts, seeds, maxIter = 30, threshold = 5.0)

    def sse(centers: Seq[Point]): Double = {
      import org.apache.spark.sql.functions._
      val assigned = Assign.assign(pts, centers)
      val cx = array(centers.map(c => lit(c.x)): _*)(col("cluster"))
      val cy = array(centers.map(c => lit(c.y)): _*)(col("cluster"))
      val cz = array(centers.map(c => lit(c.z)): _*)(col("cluster"))
      assigned.select(sum(
        (col("x") - cx) * (col("x") - cx) +
          (col("y") - cy) * (col("y") - cy) +
          (col("z") - cz) * (col("z") - cz)).as("sse"))
        .collect().head.getDouble(0)
    }

    val ours = sse(r.centers.map(_._2))
    val features = new VectorAssembler()
      .setInputCols(Array("x", "y", "z")).setOutputCol("features")
      .transform(pts)
    val mllib = new KMeans().setK(5).setSeed(42L).setMaxIter(30)
      .fit(features)
    val theirs = mllib.summary.trainingCost
    withClue(s"ours=$ours mllib=$theirs: ") {
      ours should be <= theirs * 1.10
    }
  }
}
