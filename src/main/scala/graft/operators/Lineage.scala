package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage truncation for loop-carried DataFrames.
  *
  * An iterative operator that persists its per-iteration state still
  * grows the LOGICAL plan: iteration k's frame embeds iteration k-1's
  * full logical tree (cache substitution happens after analysis, so the
  * analyzer walks the whole thing). With one self-reference per
  * iteration the tree grows linearly; with two (e.g. a rank relation
  * used by both the contribution join and the teleport join) it DOUBLES
  * per iteration — measured here as 2.2 s → 45 s from 1 to 5 PageRank
  * iterations at sf0.1 before this fix, pure driver-side analysis cost.
  *
  * [[cut]] is the standard remedy (same shape as GraphFrames' iteration
  * checkpointing): an eager `localCheckpoint` materializes the frame and
  * re-roots it as a leaf `LogicalRDD`, so every iteration's plan has
  * constant size. The backing blocks are registered with
  * [[CacheRegistry]] — per the drain contract, callers finish a query's
  * actions before draining; unlike a persisted frame, a checkpointed one
  * cannot recompute after its blocks are dropped (its lineage is gone).
  *
  * Executor-loss note: `localCheckpoint` data is not fault-tolerant. On
  * a real cluster a long graph run should use reliable checkpointing
  * (`SparkContext.setCheckpointDir` + `Dataset.checkpoint`), the
  * GraphX/GraphFrames practice; the tradeoff is an HDFS write per cut.
  */
object Lineage {

  /** Eagerly materialize `df` and return it re-rooted as a constant-size
    * leaf plan, with the backing blocks tracked for
    * [[CacheRegistry.drain]].
    */
  def cut(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    out.queryExecution.analyzed match {
      case r: LogicalRDD => CacheRegistry.trackRdd(r.rdd)
      case _ => // leaf re-rooting still happened; ContextCleaner frees it
    }
    out
  }

  /** Drop a previously-[[cut]] frame's backing blocks (non-blocking).
    * In an iterative loop the k-1 state is dead the moment the k-th cut
    * has materialized — releasing it keeps the loop at ~2 live copies
    * instead of `iters` (at the 10⁹-node PageRank scale the module doc
    * cites, that is ~32 GB resident vs ~100 GB). A released frame must
    * not be re-read: its lineage is gone. The later
    * [[CacheRegistry.drain]] of the same RDD is an idempotent no-op.
    */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case r: LogicalRDD => r.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
