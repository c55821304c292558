package graft.util

import org.apache.spark.sql.DataFrame

/** Checkpoint-block lifecycle for iterative and standing operators.
  *
  * Every lineage-truncating loop in graft (`PageRank`, BPE, label
  * propagation, the incremental ANN indexes, the streaming fold
  * classes) pins its per-round state with `localCheckpoint(true)` and
  * releases the superseded round. The trap: `Dataset.unpersist` is a
  * NO-OP for checkpoint blocks — it only consults the `CacheManager`,
  * and a checkpoint persists its RDD directly with the block manager —
  * so `state.localCheckpoint(true); ...; state.unpersist()` silently
  * leaves every superseded generation's blocks alive until the
  * `Dataset` object happens to be garbage-collected (ContextCleaner).
  * Fine for a short batch job; unbounded working-set growth between
  * GCs for a standing session. Measured, not assumed:
  * `StreamingChunkDedupSpec` counts `getPersistentRDDs` before/after
  * release.
  *
  * [[release]] goes through the plan's `LogicalRDD` leaves to the
  * checkpoint RDDs themselves, which is the level the blocks actually
  * live at. */
object Lineage {

  /** Eagerly release the block-manager blocks behind a
    * `localCheckpoint`'d frame. Safe on any frame: non-checkpoint
    * plans have no `LogicalRDD` leaf and are untouched. Only call on a
    * frame whose checkpoint generation is SUPERSEDED — a released
    * checkpoint cannot be recomputed (its lineage was truncated). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
