package graft.kmeans

import graft.SparkSpec

/** k-means|| seeding (KMeansRunner.scalableInit): determinism, seed
  * count, degenerate corpora, and end-to-end seeding quality vs the
  * greedy k-center init on a well-separated synthetic cloud. */
class ScalableInitSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // 4 well-separated cluster centers, 40 points each on a deterministic
  // sub-grid around the center (spread < 4, separation 100)
  private lazy val cloud = {
    val centers = Seq(Point(0, 0, 0), Point(100, 0, 0), Point(0, 100, 0), Point(0, 0, 100))
    val pts = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 40
    } yield (c.x + (i % 5) * 0.8, c.y + ((i / 5) % 4) * 0.7, c.z + (i / 20) * 0.9 + ci * 0.01)
    pts.toDF("x", "y", "z")
  }

  private def sse(pts: org.apache.spark.sql.DataFrame, cents: Seq[Point]): Double =
    Assign.assign(pts, cents)
      .select(cents.zipWithIndex.map { case (c, i) =>
        when(col("cluster") === i,
          (col("x") - c.x) * (col("x") - c.x) +
            (col("y") - c.y) * (col("y") - c.y) +
            (col("z") - c.z) * (col("z") - c.z)).otherwise(lit(0.0))
      }.reduce(_ + _).as("d"))
      .agg(sum(col("d"))).collect().head.getDouble(0)

  test("deterministic: the same corpus seeds identically twice") {
    val a = KMeansRunner.scalableInit(cloud, k = 4)
    val b = KMeansRunner.scalableInit(cloud, k = 4)
    a shouldBe b
  }

  test("seeding is partition-count AND row-order invariant, ORDER included") {
    // seed order is part of the contract (it becomes the downstream
    // cluster-id labeling): per-round candidate batches sort before
    // appending, so the collect order of an unordered filter can't leak
    val base = KMeansRunner.scalableInit(cloud.coalesce(1), k = 4)
    KMeansRunner.scalableInit(cloud.repartition(8), k = 4) shouldBe base
    KMeansRunner.scalableInit(cloud.orderBy(col("x").desc, col("y").desc), k = 4) shouldBe base
  }

  test("returns k seeds and converge lands within 5% of the k-center init's SSE") {
    val seeds = KMeansRunner.scalableInit(cloud, k = 4)
    seeds should have size 4
    seeds.distinct should have size 4
    val viaScalable = KMeansRunner.converge(cloud, seeds, maxIter = 20, threshold = 0.001)
    val viaGreedy = KMeansRunner.converge(cloud,
      KMeansRunner.farthestPointInit(cloud, 4), maxIter = 20, threshold = 0.001)
    val s1 = sse(cloud, viaScalable.centers.map(_._2))
    val s2 = sse(cloud, viaGreedy.centers.map(_._2))
    // both inits must find the 4 separated clusters: near-identical SSE
    s1 should be <= s2 * 1.05
  }

  test("sub-grid magnitudes: tiny-coordinate corpora still seed fully") {
    // every d² here is < 5e-19 — below the decimal cost grid's
    // resolution. The done-check must use the exact max, and the
    // underflowed cost must fall back to n·max, or seeding would stop
    // at round 0 with a single seed (the regression this pins)
    val pts = Seq(
      (0.0, 0.0, 0.0), (1e-10, 0.0, 0.0), (0.0, 1e-10, 0.0))
      .toDF("x", "y", "z")
    val seeds = KMeansRunner.scalableInit(pts, k = 3, rounds = 8, oversample = 50.0)
    seeds.toSet shouldBe Set(Point(0, 0, 0), Point(1e-10, 0, 0), Point(0, 1e-10, 0))
  }

  test("1e10-scale coordinates: cost grid caps + falls back, never overflows") {
    // d² between these points is ~4e20–1.2e21 — above decimal(38,18)'s
    // ~1e20 integer ceiling, so an uncapped cast would throw
    // CAST_OVERFLOW under ANSI and crash seeding (the regression this
    // pins); the capped rows route cost to the n·max fallback instead
    val pts = Seq(
      (0.0, 0.0, 0.0), (2e10, 0.0, 0.0), (0.0, 2e10, 0.0), (2e10, 2e10, 1e10))
      .toDF("x", "y", "z")
    val seeds = KMeansRunner.scalableInit(pts, k = 4, rounds = 8, oversample = 50.0)
    seeds.toSet shouldBe Set(
      Point(0, 0, 0), Point(2e10, 0, 0), Point(0, 2e10, 0), Point(2e10, 2e10, 1e10))
  }

  test("reclusterWeighted: zero-weight distinct candidates still fill to k") {
    // the weighted argmax tie-breaks to the largest-coordinate point,
    // which here IS the already-chosen heavy center (score 0 because
    // min d² = 0) while two zero-weight DISTINCT candidates remain —
    // the scaladoc contract (min(k, distinct candidates) seeds) demands
    // they be used, not an early return with 1 seed
    val cand = Seq(
      (Point(5, 0, 0), 3.0), (Point(1, 0, 0), 0.0), (Point(2, 0, 0), 0.0))
    val out = KMeansRunner.reclusterWeighted(cand, k = 3)
    out should have size 3
    out.toSet shouldBe Set(Point(5, 0, 0), Point(1, 0, 0), Point(2, 0, 0))
  }

  test("degenerate corpus of one repeated point returns a single seed") {
    val pts = Seq.fill(50)((3.0, 4.0, 5.0)).toDF("x", "y", "z")
    KMeansRunner.scalableInit(pts, k = 5) shouldBe Seq(Point(3, 4, 5))
  }

  test("k larger than distinct points returns every distinct point") {
    val pts = Seq((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0))
      .toDF("x", "y", "z")
    val seeds = KMeansRunner.scalableInit(pts, k = 10, rounds = 8, oversample = 50.0)
    seeds.toSet shouldBe Set(Point(0, 0, 0), Point(1, 0, 0), Point(0, 1, 0))
  }
}
