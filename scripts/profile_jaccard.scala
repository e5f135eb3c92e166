// Per-stage CPU breakdown of dedup_jaccard at a given SF - profiling aid
// for the r7 "one query owns 26% of suite CPU" flag. Run with:
//   spark-shell --master 'local[32]' --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.ui.enabled=false --jars target/scala-2.13/*.jar \
//     -i scripts/profile_jaccard.scala 2>/dev/null
// Reads SPARK_GRAFT_SF_DIR (default sf0.1). Prints one line per stage:
// stageId, wall-ms, executor-CPU-ms, records read/written, and the
// first callsite line of the stage, then phase subtotals.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
case class StageRow(id: Int, name: String, wallMs: Long, cpuMs: Long,
                    recordsIn: Long, shuffleReadRec: Long, shuffleWriteRec: Long)
val stages = ArrayBuffer[StageRow]()
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val m = si.taskMetrics
    val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
    val graftSite = si.details.linesIterator
      .find(l => l.contains("graft.") && !l.contains("Profile"))
      .getOrElse(si.name.takeWhile(_ != '\n')).trim
    stages.synchronized {
      stages += StageRow(si.stageId, graftSite, wall,
        m.executorCpuTime / 1000000L, m.inputMetrics.recordsRead,
        m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten)
    }
  }
})
spark.sparkContext.setLogLevel("WARN")

val docs = spark.read.parquet(s"$sfDir/documents.parquet")
// warm: JIT + page cache off the clock, same corpus
graft.llm.Dedup.jaccardPairs(docs, 0.5, 1000L).count()
stages.clear()
val t0 = System.nanoTime()
val n = graft.llm.Dedup.jaccardPairs(docs, 0.5, 1000L).count()
Thread.sleep(1500) // listener bus drain
val wallSec = (System.nanoTime() - t0) / 1e9
println(f"\n=== dedup_jaccard @ $sfDir: $n pairs, wall $wallSec%.2f s ===")
println(f"${"stage"}%-6s ${"wall-ms"}%9s ${"cpu-ms"}%9s ${"in-rec"}%12s ${"shRd-rec"}%12s ${"shWr-rec"}%12s  name")
stages.sortBy(-_.cpuMs).foreach { s =>
  println(f"${s.id}%-6d ${s.wallMs}%9d ${s.cpuMs}%9d ${s.recordsIn}%12d ${s.shuffleReadRec}%12d ${s.shuffleWriteRec}%12d  ${s.name.take(90)}")
}
println(f"\nTOTAL cpu: ${stages.map(_.cpuMs).sum / 1000.0}%.1f s over ${stages.size} stages")
System.exit(0)
