// Phase-by-phase CPU attribution for dedup_jaccard (ASCII only).
// Rebuilds the jaccardPairs pipeline from its public pieces and runs
// each phase in sequence, snapshotting cumulative executor CPU between
// phases, so attribution is by construction rather than stage-name
// guessing. Run like profile_jaccard.scala.
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val cpuNanos = new AtomicLong(0L)
spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
  override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) { cpuNanos.addAndGet(m.executorCpuTime); () }
  }
})
def snap(): Long = { Thread.sleep(800); cpuNanos.get() }
def phase(name: String)(f: => Long): Unit = {
  val c0 = snap(); val t0 = System.nanoTime()
  val n = f
  val wall = (System.nanoTime() - t0) / 1e9
  val cpu = (snap() - c0) / 1e9
  println(f"PHASE $name%-28s wall=$wall%7.2f s  cpu=$cpu%7.2f s  rows=$n%d")
}
spark.sparkContext.setLogLevel("WARN")

val docs = spark.read.parquet(s"$sfDir/documents.parquet")
// warm whole query once (JIT, page cache)
graft.llm.Dedup.jaccardPairs(docs, 0.5, 1000L).count()
spark.catalog.clearCache()

val sh = graft.llm.Dedup.shingleRows(docs.repartition(64))
  .select(col("doc_id"), graft.llm.Dedup.shingleHash(col("s")).as("h"))
  .persist()
phase("A_shingle_hash_persist") { sh.count() }
val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
phase("B_sizes_agg") { sizes.count() }
val dfc = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
  .filter(col("df") <= 1000L).select(col("h"))
val kept = sh.join(dfc, Seq("h"))
phase("C_dfcap_join") { kept.count() }
val hashInter = kept.as("a")
  .join(kept.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
  .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
  .agg(count(lit(1)).as("ic"))
phase("D_selfjoin_pairagg") { hashInter.count() }
val cand = hashInter
  .join(sizes.as("na"), col("da") === col("na.doc_id"))
  .join(sizes.as("nb"), col("db") === col("nb.doc_id"))
  .filter(col("ic") >= lit(0.5) * (col("na.n") + col("nb.n")) / 1.5)
  .select(col("da"), col("db"))
phase("E_bound_filter") { cand.count() }
phase("F_full_operator") { graft.llm.Dedup.jaccardPairs(docs, 0.5, 1000L).count() }
System.exit(0)
