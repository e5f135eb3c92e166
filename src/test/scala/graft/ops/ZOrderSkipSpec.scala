package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The data-skipping proof behind ZOrder: q_zorder verifies the KEY is
  * right; this spec measures the POINT of it. The same 10k events are
  * written twice with small parquet row groups — once sorted linearly
  * by (user_id, hod), once by the Morton key — and the footers are read
  * back (LayoutStats). A range predicate on the SECOND dimension must
  * prune row groups under the Z layout while the linear sort leaves
  * (almost) every group readable, and the engine-level scan metric must
  * agree with the footer arithmetic. */
class ZOrderSkipSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString + "/out"

  // one file, ~8 KiB row groups: enough groups for pruning to be visible
  private def writeSorted(df: DataFrame, sortCols: Seq[String], dir: String): Unit =
    df.repartition(1).sortWithinPartitions(sortCols.map(col): _*)
      .write.option("parquet.block.size", "8192").mode("overwrite").parquet(dir)

  private lazy val (linDir, zDir) = {
    val ev = graft.SparkEntry.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id"), expr("(tus div 3600000000) % 24").as("hod"))
      .withColumn("zkey", ZOrder.key(col("user_id"), col("hod")))
    val lin = tmp("lin"); val z = tmp("z")
    writeSorted(ev, Seq("user_id", "hod"), lin)
    writeSorted(ev, Seq("zkey"), z)
    (lin, z)
  }

  private val dims = Seq("user_id", "hod")

  test("footer stats: an hod-only range prunes Z-layout row groups; the linear layout reads ~all") {
    val linG = LayoutStats.rowGroupStats(spark, linDir, dims)
    val zG = LayoutStats.rowGroupStats(spark, zDir, dims)
    // the proof is vacuous unless the files really have many row groups
    linG.size should be >= 4
    zG.size should be >= 4
    val pred = Map("hod" -> (6L, 7L))
    val linSurv = LayoutStats.survivors(linG, pred).size
    val zSurv = LayoutStats.survivors(zG, pred).size
    withClue(s"lin $linSurv/${linG.size} vs z $zSurv/${zG.size}: ") {
      // linear (user, hod) sort: each group spans several whole users and
      // therefore every hod — stats can skip (almost) nothing
      linSurv.toDouble should be >= 0.9 * linG.size
      // the Z layout confines hod to a sub-range per group
      zSurv should be < linSurv
      zSurv.toDouble should be < 0.7 * zG.size
    }
  }

  test("footer stats: the FIRST dimension still prunes under Z — skipping works on either dim") {
    val zG = LayoutStats.rowGroupStats(spark, zDir, dims)
    val zSurv = LayoutStats.survivors(zG, Map("user_id" -> (40L, 49L))).size
    withClue(s"z $zSurv/${zG.size}: ") {
      zSurv.toDouble should be < 0.7 * zG.size
    }
  }

  test("writeClustered: the helper-written layout prunes on BOTH dims and drops the key column") {
    val ev = graft.SparkEntry.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id"), expr("(tus div 3600000000) % 24").as("hod"))
    val dir = tmp("wc")
    ZOrder.writeClustered(ev, Seq(col("user_id"), col("hod")), dir,
      numFiles = 3, rowGroupBytes = 8192)
    val g = LayoutStats.rowGroupStats(spark, dir, dims)
    g.size should be >= 4
    withClue(s"${g.size} groups: ") {
      // 3 output files coarsen row-group granularity vs the single-file
      // fixture above (fewer, larger groups), so the second-dim bound is
      // looser here — the claim is skipping EXISTS on the non-leading
      // dim (a linear sort reads 100%), pinned tighter above
      LayoutStats.survivors(g, Map("hod" -> (6L, 7L))).size.toDouble should be < 0.85 * g.size
      LayoutStats.survivors(g, Map("user_id" -> (40L, 49L))).size.toDouble should be < 0.7 * g.size
    }
    g.map(_.file).distinct.size should be >= 2 // range exchange really split files
    val back = spark.read.parquet(dir)
    back.count() shouldBe ev.count()
    back.columns should not contain "__zkey"
  }

  test("engine agrees: the scan's numOutputRows under the hod predicate is smaller on the Z layout") {
    def scanRows(dir: String): Long = {
      val q = spark.read.parquet(dir).filter(col("hod").between(6, 7))
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    }
    val lin = scanRows(linDir)
    val z = scanRows(zDir)
    withClue(s"scan rows lin=$lin z=$z: ") { z should be < lin }
    // and pruning never changed the answer
    spark.read.parquet(zDir).filter(col("hod").between(6, 7)).count() shouldBe
      spark.read.parquet(linDir).filter(col("hod").between(6, 7)).count()
  }
}
