package graft.eval

import graft.SparkSpec
import graft.kmeans.{Assign, Point}

class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  /** K=2, two points each, all on the x axis — every quantity exact:
    * cluster 0: (0,0,0), (2,0,0); cluster 1: (10,0,0), (12,0,0).
    * intra(0): ordered pairs (2+2)/(2*1) = 2; same for cluster 1.
    * inter(0): dists 10,12,8,10 -> 40/(2*1) = 20.
    * score(0): (20-2)/20 = 0.9.
    * inter(1): same sum 40 -> 20; score 0.9.
    */
  private def microAssigned = Seq(
    (0.0, 0.0, 0.0, 0), (2.0, 0.0, 0.0, 0),
    (10.0, 0.0, 0.0, 1), (12.0, 0.0, 0.0, 1)
  ).toDF("x", "y", "z", "cluster")

  test("metrics matches the hand-computed micro fixture") {
    val m = Silhouette.metrics(microAssigned).collect()
    m.map(_.getInt(0)).toSeq shouldBe Seq(0, 1)
    val c0 = m(0)
    c0.getLong(1) shouldBe 2L
    c0.getDouble(2) shouldBe 2.0   // avg intra
    c0.getDouble(3) shouldBe 20.0  // avg inter (quirk divisor n*(K-1))
    c0.getDouble(4) shouldBe 0.9   // silhouette
  }

  test("guard: single-point clusters are skipped (SilhouetteEvaluation2 semantics)") {
    val df = Seq(
      (0.0, 0.0, 0.0, 0), (2.0, 0.0, 0.0, 0),
      (99.0, 0.0, 0.0, 1) // singleton
    ).toDF("x", "y", "z", "cluster")
    val m = Silhouette.metrics(df, guards = true).collect()
    m.map(_.getInt(0)).toSeq shouldBe Seq(0)
  }

  test("guard: all-identical points (zero distances) produce no score row") {
    val df = Seq(
      (1.0, 1.0, 1.0, 0), (1.0, 1.0, 1.0, 0)
    ).toDF("x", "y", "z", "cluster")
    Silhouette.metrics(df, guards = true).collect() shouldBe empty
  }

  test("single cluster: avg inter is 0 (no neighboring clusters)") {
    val df = Seq(
      (0.0, 0.0, 0.0, 0), (2.0, 0.0, 0.0, 0)
    ).toDF("x", "y", "z", "cluster")
    val m = Silhouette.metrics(df, guards = true).collect()
    m.head.getDouble(3) shouldBe 0.0
    // score = (0 - 2) / max(2, 0) = -1
    m.head.getDouble(4) shouldBe -1.0
  }

  test("metricLines renders the reference text format") {
    Silhouette.metricLines(Seq((0, 1.5, 2.5, 0.4))) shouldBe
      Seq("0\tAvg Intra: 1.5, Avg Inter: 2.5, Silhouette Score: 0.4")
  }

  test("silhouette of reference-converged clustering is near 1 on separated data") {
    // sanity: two tight blobs far apart
    val pts = (0 until 20).map(i => (i % 10 * 0.1, 0.0, 0.0)) ++
      (0 until 20).map(i => (1000.0 + i % 10 * 0.1, 0.0, 0.0))
    val assigned = Assign.assign(pts.toDF("x", "y", "z"),
      Seq(Point(0, 0, 0), Point(1000, 0, 0)))
    val m = Silhouette.metrics(assigned).collect()
    all(m.map(_.getDouble(4))) should be > 0.99
  }
}
