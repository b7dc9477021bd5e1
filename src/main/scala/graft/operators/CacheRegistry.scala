package graft.operators

import org.apache.spark.sql.DataFrame

/** Tracks DataFrames persisted inside operators (MinHash shingle sets,
  * coalition fact relations, PCA features, ...) so long-lived sessions can
  * release executor storage once a query's actions are done.
  *
  * Operators persist intermediates that feed several downstream subtrees —
  * they cannot unpersist eagerly because their result is still lazy when
  * they return. Callers (Bench, Verify, the serving layer's cache
  * invalidation) call [[drain]] after the final action of each query;
  * leaving frames tracked is safe (MEMORY_AND_DISK evicts under pressure)
  * but wasteful in a serving session that runs many different queries.
  */
object CacheRegistry {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()
  private val trackedBroadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.broadcast.Broadcast[_]]()
  private val trackedCheckpointed =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a persisted frame for later release. Returns the frame. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Register a cached RDD (the mllib PCA path) for later release. */
  def trackRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] = {
    trackedRdds.add(rdd); rdd
  }

  /** Register a broadcast (e.g. a Bloom sketch, GB-scale at corpus
    * sizes) for later release; drain() unpersists executor copies — the
    * driver value survives, so a still-lazy plan that re-executes simply
    * re-broadcasts instead of failing.
    */
  def trackBroadcast[T](bc: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] = {
    trackedBroadcasts.add(bc); bc
  }

  /** Register a reliable-checkpointed frame ([[Lineage.cut]] under
    * `spark.graft.lineage.reliable`) so [[drain]] deletes its checkpoint
    * FILES. Iterative operators release dead generations themselves, but
    * the TERMINAL generation of a loop outlives the operator (it is the
    * result) — without this, every invocation in reliable mode leaks one
    * checkpoint directory for the application lifetime
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` defaults to
    * false). [[Lineage.release]] on an already-drained frame — and the
    * drain of an already-released one — are idempotent no-ops.
    */
  def trackCheckpointed(df: DataFrame): DataFrame = {
    trackedCheckpointed.add(df); df
  }

  /** Forget a reliable-checkpointed frame without touching its files —
    * [[Lineage.release]] calls this after deleting a dead generation, so
    * the queue stays bounded by LIVE generations (~2 in an iterative
    * loop), not by total iterations.
    */
  private[operators] def untrackCheckpointed(df: DataFrame): Unit = {
    trackedCheckpointed.remove(df); ()
  }

  /** Unpersist every tracked frame/RDD (non-blocking), clear the registry. */
  def drain(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      rdd.unpersist(blocking = false)
      rdd = trackedRdds.poll()
    }
    var bc = trackedBroadcasts.poll()
    while (bc != null) {
      bc.unpersist(false)
      bc = trackedBroadcasts.poll()
    }
    var ck = trackedCheckpointed.poll()
    while (ck != null) {
      Lineage.release(ck)
      ck = trackedCheckpointed.poll()
    }
  }

  /** Number of currently tracked frames + RDDs + broadcasts +
    * reliable checkpoints (for tests).
    */
  def size: Int = tracked.size + trackedRdds.size + trackedBroadcasts.size +
    trackedCheckpointed.size
}
