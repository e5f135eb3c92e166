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

  // ---- n-dimensional generalization ------------------------------------

  /** Driver-side reference: naive per-bit interleave for n dims, dim i
    * on positions n*bit + i. */
  private def refKeyN(dims: Seq[Long]): Long = {
    val n = dims.size
    val bits = ZOrder.inputBits(n)
    var out = 0L
    for ((d, i) <- dims.zipWithIndex; b <- 0 until bits)
      out |= ((d >> b) & 1L) << (n * b + i)
    out
  }

  for (n <- 2 to 4)
    test(s"keyN($n dims) matches the naive per-bit interleave on random values") {
      val bits = ZOrder.inputBits(n)
      val mask = (1L << bits) - 1L
      val rnd = new scala.util.Random(23 + n)
      val data = (1 to 200).map(_ => Seq.fill(n)(rnd.nextLong() & mask)) ++
        Seq(Seq.fill(n)(0L), Seq.fill(n)(mask),
          Seq.tabulate(n)(i => if (i == 0) mask else 0L),
          Seq.tabulate(n)(i => if (i == n - 1) mask else 0L))
      val cols = (0 until n).map(i => s"d$i")
      val df = data.map(Tuple1(_)).toDF("ds")
        .select((0 until n).map(i => element_at(col("ds"), i + 1).as(s"d$i")): _*)
      val out = df.select(struct(cols.map(col): _*).as("in"),
          ZOrder.keyN(cols.map(col)).as("z"))
        .collect()
        .map(r => (Seq.tabulate(n)(i => r.getStruct(0).getLong(i)), r.getLong(1)))
      for ((ds, z) <- out) withClue(s"$ds: ") {
        z shouldBe refKeyN(ds)
        z should be >= 0L // signed order IS Morton order at every n
      }
    }

  test("keyN of two dims is EXACTLY key(a, b) — one construction, not two") {
    val rnd = new scala.util.Random(5)
    val data = (1 to 100).map(_ =>
      (rnd.nextLong() & 0x7FFFFFFFL, rnd.nextLong() & 0x7FFFFFFFL))
    val bad = data.toDF("a", "b")
      .filter(ZOrder.keyN(Seq(col("a"), col("b"))) =!= ZOrder.key(col("a"), col("b")))
    bad.count() shouldBe 0L
  }

  test("4-dim locality: a 2-aligned 2x2x2x2 block is one contiguous key range") {
    val base = Seq(6L << 1, 3L << 1, 9L << 1, 0L << 1)
    val block = for (i <- 0L to 1L; j <- 0L to 1L; k <- 0L to 1L; l <- 0L to 1L)
      yield refKeyN(Seq(base(0) + i, base(1) + j, base(2) + k, base(3) + l))
    val sorted = block.sorted
    sorted.last - sorted.head shouldBe 15L
    sorted.distinct.size shouldBe 16
  }

  test("n-dim inputs beyond inputBits are masked, never sign-contaminated") {
    for (n <- 3 to 4) {
      val mask = (1L << ZOrder.inputBits(n)) - 1L
      val dims = Seq.fill(n)(-1L)
      val out = Seq(Tuple1(0)).toDF("x")
        .select(ZOrder.keyN(dims.map(lit(_))).as("z"))
        .collect().head.getLong(0)
      out shouldBe refKeyN(dims.map(_ & mask))
      out should be >= 0L
    }
  }
}
