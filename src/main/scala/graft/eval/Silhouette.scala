package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A4–A6 + J2 + S7: the reference's (non-standard, cluster-level)
  * Silhouette evaluation, re-expressed as self-joins + hash aggregation.
  *
  * Reference semantics (replicated exactly, quirks included):
  *   - avgIntra (A4): Σ dist over ORDERED pairs i≠j within a cluster,
  *     divided by n·(n−1)                 (reference `SilhouetteEvaluation.java:98-111`)
  *   - avgInter (A5): Σ dist(p,q) for p in the cluster, q in ANY other
  *     cluster, divided by n·(#other non-empty clusters) — note the
  *     divisor counts CLUSTERS, not points  (reference `SilhouetteEvaluation.java:113-132`)
  *   - score (A6): (avgInter − avgIntra) / max(avgIntra, avgInter)
  *                                        (reference `SilhouetteEvaluation.java:134-136`)
  *   - guards (v2/v3 only): clusters with n ≤ 1 are skipped
  *     (reference `SilhouetteEvaluation2.java:201-204`); a score is emitted only
  *     when avgIntra > 0 or avgInter > 0 (reference `SilhouetteEvaluation2.java:243-249`).
  *     v1 (`SilhouetteEvaluation.java`) has neither guard.
  *
  * Spark-first formulation: the reference collects every point of every
  * cluster into one reducer / the driver and runs O(n²) nested loops on a
  * single thread. Here both pair spaces are distributed self-joins whose
  * distance sums partial-aggregate map-side before one K-row shuffle:
  *   - intra: equi-join on cluster id (hash-partitioned by cluster). The
  *     i≠j exclusion is free — dist(i,i)=0 contributes nothing to the SUM,
  *     and the n·(n−1) divisor comes from the separate count, so the full
  *     self-join (including self-pairs) yields the identical sum.
  *   - inter: theta-join cluster≠cluster. K is small, so the right side is
  *     broadcast when it fits; the output never materializes pair rows —
  *     codegen'd distance feeds straight into the partial sum.
  *
  * Scale note: the exact pair space is inherently O(n²) — this is the
  * reference's semantics, not an implementation choice. At 100 TB run it
  * on a deterministic sample (`sampled`) — Euclidean distance sums do not
  * decompose algebraically (unlike squared distances), so subsampling is
  * the honest scale path and preserves the metric within sampling error.
  */
object Silhouette {

  /** P2 distance between the two sides of the self-join. Squares by
    * multiplication (never pow) per the cross-engine float discipline —
    * the DuckDB oracle mirrors `(a-b)*(a-b)` literally, and golden parity
    * only needs 1e-9 relative, so matching Math.pow bits is unnecessary. */
  private def pairDist: org.apache.spark.sql.Column = {
    def sq(c: org.apache.spark.sql.Column) = c * c
    sqrt(sq(col("a.x") - col("b.x")) +
      sq(col("a.y") - col("b.y")) +
      sq(col("a.z") - col("b.z")))
  }

  /** Computes per-cluster (cluster, n, avg_intra, avg_inter, silhouette)
    * from an assigned DataFrame with columns x, y, z, cluster.
    *
    * @param guards if true, apply the v2/v3 guards (drop n≤1 clusters and
    *               zero-distance scores); if false, v1 semantics (no guards,
    *               score may be NaN when both averages are 0).
    */
  def metrics(assigned: DataFrame, guards: Boolean = true): DataFrame = {
    // persist: the assigned points feed five plan references (sizes +
    // both sides of two self-joins); without it the upstream scan and
    // assignment expression re-run per reference
    val pts = assigned.select(col("cluster"), col("x"), col("y"), col("z"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = pts.as("a")
    val b = pts.as("b")

    // n per cluster (the divisors use counts, never pair-row counts)
    val sizes = pts.groupBy(col("cluster")).agg(count(lit(1)).as("n"))

    // A4: intra-cluster ordered-pair distance sum (self-pairs add 0)
    val intra = a.join(b, col("a.cluster") === col("b.cluster"))
      .groupBy(col("a.cluster").as("cluster"))
      .agg(sum(pairDist).as("intra_sum"))

    // A5: inter-cluster distance sum + number of other non-empty clusters
    val inter = a.join(b, col("a.cluster") =!= col("b.cluster"))
      .groupBy(col("a.cluster").as("cluster"))
      .agg(
        sum(pairDist).as("inter_sum"),
        countDistinct(col("b.cluster")).as("neighbors"))

    val joined = sizes
      .join(intra, Seq("cluster"), "left")
      .join(inter, Seq("cluster"), "left")
      .withColumn("avg_intra",
        when(col("n") > 1, coalesce(col("intra_sum"), lit(0.0)) / (col("n") * (col("n") - 1)))
          .otherwise(lit(0.0)))
      .withColumn("avg_inter",
        when(coalesce(col("neighbors"), lit(0L)) > 0,
          col("inter_sum") / (col("n") * col("neighbors")))
          .otherwise(lit(0.0)))
      .withColumn("silhouette",
        (col("avg_inter") - col("avg_intra")) /
          greatest(col("avg_intra"), col("avg_inter")))
      .select(col("cluster"), col("n"), col("avg_intra"), col("avg_inter"), col("silhouette"))

    val guarded =
      if (guards)
        joined.filter(col("n") > 1)
          .filter(col("avg_intra") > 0 || col("avg_inter") > 0)
      else joined
    // materialize the K-row result, then release the (large) cached
    // points — per-iteration callers (C4 hook, cli.Silhouette2/3) would
    // otherwise accumulate one cached point set per call for the life of
    // the session. Callers may unpersist the returned frame.
    val out = guarded.orderBy(col("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    pts.unpersist(false)
    out
  }

  /** Scale path: same metric over a deterministic Bernoulli sample. The
    * divisors adapt to the sampled counts, so the averages remain unbiased
    * estimates of the full-data metric. */
  def sampled(assigned: DataFrame, fraction: Double, seed: Long = 42L,
              guards: Boolean = true): DataFrame =
    metrics(assigned.sample(withReplacement = false, fraction, seed), guards)

  /** S7: reference metric text lines
    * `clusterId\tAvg Intra: <d>, Avg Inter: <d>, Silhouette Score: <d>`
    * (reference `SilhouetteEvaluation.java:138-139`), Double.toString rendering.
    */
  def metricLines(metrics: Seq[(Int, Double, Double, Double)]): Seq[String] =
    metrics.map { case (id, intra, inter, s) =>
      s"$id\tAvg Intra: $intra, Avg Inter: $inter, Silhouette Score: $s"
    }

  /** Collects `metrics` output to (cluster, avgIntra, avgInter, silhouette). */
  def collectMetrics(assigned: DataFrame, guards: Boolean = true): Seq[(Int, Double, Double, Double)] =
    metrics(assigned, guards).collect().toSeq.map { r =>
      (r.getInt(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }
}
