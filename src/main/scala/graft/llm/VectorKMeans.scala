package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General-dimension Lloyd's K-Means over an `array<double>` vector
  * column — the engine's 3-D K-Means core (assign -> re-center ->
  * driver collect of K rows) generalized to embedding space, used to FIT
  * the IVF coarse quantizer instead of picking corpus vectors by id.
  *
  * Spark-first shape, mirroring graft.kmeans:
  *   - assignment: argmin over K literal centroid arrays via a codegen'd
  *     struct/array_min expression (K*dim literals inline; no UDF, no
  *     shuffle, no broadcast round-trip)
  *   - re-centering: posexplode to (cell, dim, value) rows, ONE
  *     HashAggregate keyed (cell, dim) with map-side partial (sum,count),
  *     K*dim rows collected to the driver per iteration
  *   - convergence: driver-side Σ-displacement over K centroids
  *
  * At 100 TB the per-iteration cost is one scan + one K*dim-row shuffle,
  * identical in structure to the 3-D runner.
  */
object VectorKMeans {

  case class Result(centers: Seq[Array[Double]], iterations: Int, converged: Boolean)

  /** Fixed grid for the re-centering mean: each element is rounded onto
    * a 1e-6 grid and scaled to BIGINT *before* the cross-partition sum,
    * so the per-(cell, dim) sum is exact integer arithmetic —
    * associative, hence invariant to partial-merge order — and the only
    * float operation is ONE division at the end. A double `avg` is
    * summation-order-dependent: Spark's partial-sum merge order varies
    * with partitioning/scheduling while the DuckDB oracle sums in its
    * own order, so a mean landing within an ulp of a rounding boundary
    * flips run to run (the round-6 q_vkmeans_step hash regression).
    * The grid loses < 5e-7 per element — invisible at the contract's
    * 4-decimal output rounding — and buys bitwise determinism across
    * partitionings AND engines. Overflow headroom: unit-norm-ish
    * elements scale to ~1e6, so a single cell would need ~9e12 members
    * to overflow the Long sum — not reachable even at 100 TB. */
  val GridScale = 1e6

  /** Driver-side twin of Spark's `round(v * GridScale)` (Round uses the
    * shortest-decimal BigDecimal of the double, HALF_UP — identical to
    * Scala's BigDecimal(d) which is Double.toString-based). */
  def gridOf(v: Double): Long =
    BigDecimal(v * GridScale).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def litVec(v: Array[Double]): Column = array(v.map(lit).toSeq: _*)

  /** Squared L2 distance between a vector column and a literal centroid
    * (native codegen'd kernel, same accumulation order as the HOF form). */
  def distSqTo(vec: Column, c: Array[Double]): Column =
    graft.functions.VectorOps.l2sqCol(vec, litVec(c))

  /** Cell id (0-based position in `cents`) of the nearest centroid,
    * ties to the lowest cell id (array_position finds the FIRST minimum;
    * struct-based argmin is avoided because aliases on higher-order-
    * function children get stripped during resolution). */
  def cellOf(vec: Column, cents: Seq[Array[Double]]): Column = {
    val d2s = array(cents.map(c => distSqTo(vec, c)): _*)
    (array_position(d2s, array_min(d2s)) - 1).cast("int")
  }

  /** One assign+re-center step; returns the new centroid per cell (cells
    * that received no vectors keep their previous centroid, so K never
    * shrinks — the quantizer contract differs from the reference
    * K-Means, where absent clusters vanish). The mean is computed on the
    * [[GridScale]] fixed grid — exact BIGINT sums, one division — so the
    * result is order-invariant across partitionings and engines. */
  def step(emb: DataFrame, vecCol: String, cents: Seq[Array[Double]]): Seq[Array[Double]] = {
    val dim = cents.head.length
    val means = emb
      .select(cellOf(col(vecCol), cents).as("cell"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim"))
      .agg(sum(round(col("v") * lit(GridScale)).cast("long")).as("s"), count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        val arr = new Array[Double](dim)
        rows.foreach(r => arr(r.getInt(1)) = r.getLong(2).toDouble / (GridScale * r.getLong(3)))
        cell -> arr
      }
    cents.indices.map(i => means.getOrElse(i, cents(i)))
  }

  /** Typed (sum-vector, count) Aggregator — the CentroidAggregator
    * pattern lifted to arbitrary dimension. Partials are K×(dim+1)
    * values, so the shuffle after map-side combine is K rows of dim
    * sums, not rows×dim exploded cells. Sums are [[GridScale]]-gridded
    * BIGINTs (see [[gridOf]]), so partials merge exactly in any order
    * and `stepAgg` equals `step` bitwise, not just to merge-order ulps. */
  class VectorSumAgg(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Int, Seq[Double]), (Array[Long], Long), Seq[Double]] {
    import org.apache.spark.sql.Encoder
    override def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)
    override def reduce(b: (Array[Long], Long), a: (Int, Seq[Double])): (Array[Long], Long) = {
      val v = a._2
      require(v.length == dim, s"ragged vector: ${v.length} vs $dim")
      var i = 0
      while (i < dim) { b._1(i) += gridOf(v(i)); i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    override def finish(r: (Array[Long], Long)): Seq[Double] =
      if (r._2 == 0L) Seq.empty else r._1.map(_.toDouble / (GridScale * r._2)).toSeq
    override def bufferEncoder: Encoder[(Array[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `step` via the typed Aggregator: same assignment expression, but
    * re-centering shuffles K×(sum[dim], count) partials instead of
    * posexploding rows×dim cells — the hardened 100 TB form (bitwise
    * equal to `step` thanks to the shared integer grid; spec-pinned). */
  def stepAgg(emb: DataFrame, vecCol: String, cents: Seq[Array[Double]]): Seq[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = cents.head.length
    val agg = new VectorSumAgg(dim).toColumn
    val means = emb
      .select(cellOf(col(vecCol), cents).as("_1"), col(vecCol).as("_2"))
      .as[(Int, Seq[Double])]
      .groupByKey(_._1)
      .agg(agg)
      .collect()
      .collect { case (cell, m) if m.nonEmpty => cell -> m.toArray }
      .toMap
    cents.indices.map(i => means.getOrElse(i, cents(i)))
  }

  /** Fit k centroids, seeded deterministically from corpus vectors.
    * Iterates via `stepAgg` — the K×(sum[dim], count) partial form, so
    * each iteration shuffles K rows instead of rows×dim exploded cells;
    * bitwise-identical to `step` (shared integer grid, spec-pinned). */
  def fit(emb: DataFrame, vecCol: String, seedIds: Seq[Long], idCol: String = "vec_id",
          maxIter: Int = 10, tol: Double = 1e-4): Result = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    var cents: Seq[Array[Double]] = e.filter(col(idCol).isin(seedIds: _*))
      .orderBy(col(idCol)).collect().map(_.getSeq[Double](1).toArray).toSeq
    require(cents.nonEmpty, "no seed vectors found")
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val next = stepAgg(e, "v", cents)
      val disp = cents.lazyZip(next).map { (a, b) =>
        math.sqrt(a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum)
      }.sum
      cents = next
      converged = disp < tol
      i += 1
    }
    Result(cents, i, converged)
  }

  /** The fitted centroids as a (cell_id, cvec) DataFrame — the coarse
    * side expected by Similarity.ivfTopKWith. */
  def asCells(emb: DataFrame, result: Result): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    result.centers.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("cell_id", "cvec")
  }
}
