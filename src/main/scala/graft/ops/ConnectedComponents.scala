package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge list — the step a
  * training-data pipeline needs right after near-dup pair generation:
  * pairs (da, db) say "these two documents are duplicates", components
  * turn that into dedup CLUSTERS (each doc labeled with the smallest
  * doc_id of its duplicate group, which becomes the canonical keeper).
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with itself; each round a node takes the min of its
  * own label and its neighbors' labels (one join + one partial-agg
  * shuffle), then labels are short-circuited through one pointer jump
  * label(n) := label(label(n)) (labels are always node ids, so the jump
  * is a self-join). The jump collapses label chains geometrically, so
  * rounds are O(log diameter) instead of O(diameter) — on a 100 TB
  * dedup graph (billions of edges, but components are near-cliques of
  * copies of the same source text) this converges in 2-3 rounds, and
  * even an adversarial path graph of length 10^6 needs ~20.
  *
  * Everything is integer min-arithmetic — no floats — so a SQL oracle
  * (recursive-CTE transitive closure) matches bit-for-bit.
  *
  * Scale notes: per round this shuffles the edge list once (neighbor
  * join keyed by node) and the label table twice (agg + jump); the
  * driver sees only the changed-label count. The label table is
  * lineage-truncated every round (localCheckpoint — swap for
  * checkpoint() on a real cluster where executor loss must be
  * survivable): without truncation the iterated plan tree doubles per
  * round and the driver OOMs just *printing* it. Superseded label
  * blocks are dropped by Spark's ContextCleaner once unreferenced.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `edges` (columns
    * (`srcCol`, `dstCol`), any orientation, duplicates fine). Returns
    * one row per node appearing in an edge: (node, component) where
    * component = min node id reachable. Isolated nodes never appear in
    * an edge list, so callers wanting them must union singletons.
    */
  def components(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
                 maxRounds: Int = 50): DataFrame = {
    val a = col(srcCol).as("a")
    val b = col(dstCol).as("b")
    val sym = edges.select(a, b)
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()

    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // each node pulls its neighbors' current labels, keeps the min
      val nbr = sym.join(labels, sym("b") === labels("node"))
        .select(sym("a").as("node"), col("label"))
      val prop = nbr.union(labels)
        .groupBy(col("node")).agg(min("label").as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // pointer jump: labels are node ids, so label(label(n)) is defined
      val jmap = prop.select(col("node").as("jn"), col("label").as("jl"))
      val jumped = prop.join(jmap, prop("label") === jmap("jn"), "left")
        .select(prop("node"),
          least(prop("label"), coalesce(col("jl"), prop("label"))).as("label"))
        .localCheckpoint() // truncate lineage: iterated plans grow 2x/round
      changed = jumped.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old")).count()
      prop.unpersist(false)
      labels = jumped
      round += 1
    }
    sym.unpersist(false)
    labels.select(col("node"), col("label").as("component"))
  }

  /** Dedup policy over near-dup pairs: every document in a duplicate
    * cluster maps to the cluster's canonical keeper (the smallest
    * doc_id). Docs not in any pair are their own keeper and are NOT
    * returned (identity mapping is implicit). */
  def dedupClusters(pairs: DataFrame): DataFrame =
    components(pairs, srcCol = "da", dstCol = "db")
      .select(col("node").as("doc_id"), col("component").as("keep_id"))
}
