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
  }

  /** Number of currently tracked frames + RDDs + broadcasts (for tests). */
  def size: Int = tracked.size + trackedRdds.size + trackedBroadcasts.size
}
