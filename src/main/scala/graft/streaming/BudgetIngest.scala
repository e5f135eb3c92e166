package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source token-budget gate — the admission-control twin
  * of `TextAnalysis.tokenBudgetSample` for a corpus that ARRIVES rather
  * than sits in a table: each source carries a running token total in
  * state, and a document is kept iff admitting it keeps the source
  * within budget. Decisions are emitted once and never revised — the
  * property a batch recompute cannot give (re-running the batch sampler
  * on a grown corpus can flip earlier keeps, because the prefix order
  * re-ranks; the gate is first-come-first-kept).
  *
  * Ordering semantics: across micro-batches, arrival order (the real
  * ingest order); within a micro-batch, the batch twin's (fp, doc_id)
  * draw order — so a single-batch stream reproduces
  * `tokenBudgetSample` exactly (spec-pinned), and multi-batch runs
  * differ only where arrival order genuinely differs from the global
  * draw order.
  *
  * Scale: state is ONE long per source (the running total) — constant
  * per key, sharded by source across the state store, independent of
  * stream length; each trigger sorts only its own batch's per-source
  * slice. Size `spark.sql.shuffle.partitions` to the source-key
  * cardinality like every stateful operator here (CLAUDE.md: state
  * stores scale with shuffle partitions). */
object BudgetIngest {

  /** One arriving document: token count + the batch twin's draw hash
    * (`fp`), both precomputed by the caller's projection. */
  case class BudgetDoc(doc_id: Long, source: String, n_toks: Long, fp: Long)

  /** The gate's verdict for one document; `cum_toks` is the source's
    * running total INCLUDING this doc, exactly the batch twin's
    * prefix-sum column. */
  case class BudgetDecision(doc_id: Long, source: String, n_toks: Long,
                            cum_toks: Long, kept: Boolean)

  case class SourceBudgetState(cum: Long)

  def tokenBudgetUpdates(docs: Dataset[BudgetDoc], budgets: Map[String, Long],
                         defaultBudget: Long): Dataset[BudgetDecision] = {
    require(defaultBudget >= 0, s"need defaultBudget >= 0, got $defaultBudget")
    require(budgets.values.forall(_ >= 0), s"budgets must be >= 0, got $budgets")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source: String, it: Iterator[BudgetDoc], state: GroupState[SourceBudgetState]) =>
          val budget = budgets.getOrElse(source, defaultBudget)
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = it.toSeq.sortBy(d => (d.fp, d.doc_id)).map { d =>
            cum += d.n_toks
            BudgetDecision(d.doc_id, source, d.n_toks, cum, cum <= budget)
          }
          state.update(SourceBudgetState(cum))
          out.iterator
      }
  }
}
