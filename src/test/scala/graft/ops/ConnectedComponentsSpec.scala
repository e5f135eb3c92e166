package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Runs BOTH execution paths (driver union-find and the distributed
    * pointer-jump loop, forced via localEdgeThreshold = 0), asserts they
    * agree, and returns the labels — every test in this suite pins both. */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val local = ConnectedComponents.components(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents.components(df, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    dist shouldBe local
    local
  }

  test("path graph collapses to the min id (pointer jumping crosses the chain)") {
    val got = cc(Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L), (10L, 11L)))
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L)
  }

  test("duplicate and reversed edges do not change the result") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 2L)))
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("matches a driver-side union-find on a random graph") {
    val rnd = new Random(42)
    val nodes = 200
    val edges = Seq.fill(150)((rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      .filter { case (a, b) => a != b }
    // reference union-find
    val parent = Array.tabulate(nodes)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> find(n.toInt).toLong).toMap
    // union-find roots are path-compressed mins only if merged by min; they are
    // (we always point the larger root at the smaller), so roots == min ids
    cc(edges) shouldBe want
  }

  test("dedupClusters maps every doc in a pair to the smallest doc_id of its cluster") {
    val pairs = Seq((5L, 9L), (9L, 2L), (40L, 41L)).toDF("da", "db")
    val got = ConnectedComponents.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 40L -> 40L, 41L -> 40L)
  }
}
