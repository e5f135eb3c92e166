package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: naive per-bit interleave. */
  private def refKey(a: Long, b: Long): Long = {
    var out = 0L
    for (i <- 0 until 31) {
      out |= ((a >> i) & 1L) << (2 * i)
      out |= ((b >> i) & 1L) << (2 * i + 1)
    }
    out
  }

  test("zorder key matches the naive per-bit interleave on random 31-bit values") {
    val rnd = new scala.util.Random(17)
    val data = (1 to 300).map(_ =>
      (rnd.nextLong() & 0x7FFFFFFFL, rnd.nextLong() & 0x7FFFFFFFL)) ++
      Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (1L, 0L), (0L, 1L))
    val out = data.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.key(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((a, b, z) <- out) withClue(s"($a, $b): ") {
      z shouldBe refKey(a, b)
      z should be >= 0L // signed order IS Morton order
    }
  }

  test("zorder locality: an aligned 4x4 block occupies one contiguous key range") {
    // the data-skipping property: rows inside a 2^k-aligned square are
    // contiguous in key order, so a sorted write puts them in the same
    // row groups and BOTH dimensions get tight min/max bounds
    val base = (12L << 2, 7L << 2) // 4-aligned corner
    val block = for (i <- 0L until 4L; j <- 0L until 4L)
      yield refKey(base._1 + i, base._2 + j)
    val sorted = block.sorted
    sorted.last - sorted.head shouldBe 15L
    sorted.distinct.size shouldBe 16
  }

  test("inputs beyond 31 bits are masked, never sign-contaminated") {
    val out = Seq((Long.MaxValue, -1L)).toDF("a", "b")
      .select(ZOrder.key(col("a"), col("b")).as("z"))
      .collect().head.getLong(0)
    out shouldBe refKey(Long.MaxValue & 0x7FFFFFFFL, -1L & 0x7FFFFFFFL)
    out should be >= 0L
  }
}
