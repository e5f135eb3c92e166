package graft.kmeans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** C1–C3, C5: the driver-side iteration loop.
  *
  * The reference runs one Hadoop job per iteration and persists centroid
  * state through HDFS files between jobs (reference `Task3.java:185-218`)
  * — the classic MapReduce iteration tax. Spark-native: points are
  * cached once; each iteration is assign (P3) → re-center (A1) →
  * `collect()` of the K centroid rows to the driver, which is the only
  * process boundary that remains. Centroids are handed to the next
  * iteration through driver memory instead of a file re-read.
  */
object KMeansRunner {

  /** Final state of a run.
    *
    * @param centers       (clusterId, centroid) for every non-empty cluster,
    *                      ascending id — same ordering the reference's
    *                      shuffle-sorted `part-r-00000` files have.
    * @param iterations    number of iterations executed.
    * @param converged     whether Σ-displacement < threshold was reached
    *                      (C5 — the convergence flag the reference README
    *                      promises but `Task5A.java:219` left commented out).
    * @param displacements Σ centroid displacement after each iteration
    *                      (A7, reference `Task3.java:116-128`).
    * @param history       centers after each iteration (element i mirrors the
    *                      reference's `iteration_i/part-r-00000` snapshot).
    */
  case class Result(
      centers: Seq[(Int, Point)],
      iterations: Int,
      converged: Boolean,
      displacements: Seq[Double],
      history: Seq[Seq[(Int, Point)]])

  /** Deterministic farthest-point (k-center greedy) seeding — an init
    * strategy beyond the reference's fixed seed file: the first centroid
    * is the lexicographically-largest point; each next one maximizes the
    * min squared distance to the chosen set (ties again lexicographic).
    * One codegen'd aggregate pass per centroid, no randomness — the same
    * corpus always seeds identically. */
  def farthestPointInit(points: DataFrame, k: Int): Seq[Point] = {
    import org.apache.spark.sql.functions._
    require(k >= 1, "k must be >= 1")
    def d2(c: Point) =
      (col("x") - c.x) * (col("x") - c.x) +
        (col("y") - c.y) * (col("y") - c.y) +
        (col("z") - c.z) * (col("z") - c.z)
    def pick(selector: org.apache.spark.sql.Column): (Point, Double) = {
      val row = points.select(max(selector).as("s")).collect().head
      require(!row.isNullAt(0), "farthestPointInit: no points")
      val r = row.getStruct(0)
      val n = r.size
      val d = if (n == 4) r.getDouble(0) else Double.PositiveInfinity
      (Point(r.getDouble(n - 3), r.getDouble(n - 2), r.getDouble(n - 1)), d)
    }
    var cents = Vector(pick(struct(col("x"), col("y"), col("z")))._1)
    var exhausted = false
    while (cents.size < k && !exhausted) {
      val minD2 = cents.map(d2).reduce(least(_, _))
      val (p, d) = pick(struct(minD2.as("d"), col("x"), col("y"), col("z")))
      // every remaining point coincides with a chosen centroid: stop
      // instead of silently returning duplicate centroids
      if (d == 0.0) exhausted = true else cents :+= p
    }
    cents
  }

  /** C1: one iteration — assign + re-center, collecting K rows to the driver. */
  def step(points: DataFrame, centroids: Seq[Point]): Seq[(Int, Point)] =
    Recenter.recenter(Assign.assign(points, centroids))
      .collect()
      .map(r => r.getInt(0) -> Point(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
      .toSeq

  /** A7: Σ_k dist(prev_k, curr_k), paired positionally like the reference's
    * file-order pairing (reference `Task3.java:116-128`). A size mismatch
    * (an emptied cluster) means "not converged" — the reference guards this
    * with a skip (reference `Task5A.java:138-140`).
    */
  def displacement(prev: Seq[Point], curr: Seq[Point]): Double =
    if (prev.size != curr.size) Double.MaxValue
    else prev.lazyZip(curr).map { (a, b) =>
      math.sqrt(math.pow(b.x - a.x, 2) + math.pow(b.y - a.y, 2) + math.pow(b.z - a.z, 2))
    }.sum

  /** C4: per-iteration hook — called after each iteration with
    * (iterationIndex, centers, assignedDataFrame). The reference runs its
    * silhouette evaluation here (reference `SilhouetteEvaluation2.java:275-278`);
    * sinks can snapshot `iteration_i` files. No-op by default. */
  type IterationHook = (Int, Seq[(Int, Point)], DataFrame) => Unit
  val noHook: IterationHook = (_, _, _) => ()

  /** C2: fixed-R loop (reference `Task2.java:137-155`, R=5). */
  def fixedIterations(points: DataFrame, seeds: Seq[Point], r: Int,
                      hook: IterationHook = noHook): Result =
    run(points, seeds, maxIter = r, threshold = None, hook)

  /** C3: converge-or-max loop (reference `Task3.java:185-218`; maxIter=30,
    * threshold=5 in the reference mains). Checks displacement after each
    * iteration and stops early once it drops below the threshold.
    */
  def converge(points: DataFrame, seeds: Seq[Point],
               maxIter: Int = 30, threshold: Double = 5.0,
               hook: IterationHook = noHook): Result =
    run(points, seeds, maxIter, Some(threshold), hook)

  private def run(points: DataFrame, seeds: Seq[Point],
                  maxIter: Int, threshold: Option[Double],
                  hook: IterationHook = noHook): Result = {
    val managedCache = points.storageLevel == StorageLevel.NONE
    if (managedCache) points.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var prev = seeds
      var centers = Seq.empty[(Int, Point)]
      var history = Vector.empty[Seq[(Int, Point)]]
      var displacements = Vector.empty[Double]
      var converged = false
      var i = 0
      while (i < maxIter && !converged) {
        centers = step(points, prev)
        history :+= centers
        hook(i, centers, Assign.assign(points, prev))
        val curr = centers.map(_._2)
        val d = displacement(prev, curr)
        displacements :+= d
        converged = threshold.exists(d < _)
        prev = curr
        i += 1
      }
      Result(centers, i, converged, displacements, history)
    } finally if (managedCache) points.unpersist()
  }
}
