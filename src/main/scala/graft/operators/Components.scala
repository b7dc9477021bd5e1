package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — the cluster-resolution
  * stage every near-dup pipeline needs after pair generation (pairs say
  * "a~b"; dedup needs "keep one representative per transitive GROUP").
  *
  * Algorithm: iterative min-label propagation — each node's label is the
  * min over itself and its neighbors' labels, repeated to fixpoint. Per
  * iteration: one join + one hash-aggregate, both shuffling on the node
  * id; iterations = graph diameter. Near-dup clusters are near-cliques
  * (diameter ~2-3), so this settles in a few passes. For general graphs
  * with long chains, the alternating star-contraction family (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * converges in O(log n) rounds — the maxIter guard names that switch
  * instead of silently looping.
  *
  * Labels converge to each component's MINIMUM node id, which makes the
  * output deterministic and oracle-friendly (component == keeper id
  * under keep-smallest-id dedup).
  */
object Components {

  /** (id, component) for every node appearing in `edges`; component =
    * min node id reachable.
    *
    * Dispatch: an edge set under `localEdgeLimit` is collected and
    * closed with driver-side union-find (milliseconds, zero iteration
    * overhead — pair relations from near-dup joins are output-sized,
    * usually tiny next to the corpus); past the limit the distributed
    * min-label propagation runs, converging to fixpoint or throwing
    * after `maxIter` (a diameter that large means propagation is the
    * wrong algorithm, not that a partial answer is acceptable).
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, localEdgeLimit: Long = 5000000L): DataFrame = {
    val probe = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .limit((localEdgeLimit + 1).toInt)
      .collect()
    if (probe.length <= localEdgeLimit) {
      val spark = edges.sparkSession
      import spark.implicits._
      return localUnionFind(probe.map(r => (r.getLong(0), r.getLong(1))))
        .toSeq.toDF("id", "component")
    }
    connectedComponentsDistributed(edges, srcCol, dstCol, maxIter)
  }

  /** Driver-side union-find with path compression; roots resolve to each
    * component's min member so the labeling matches the distributed path
    * exactly.
    */
  private[operators] def localUnionFind(
      edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // union by MIN root: the smaller id becomes the representative
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** The scale path: iterative min-label propagation (see object doc). */
  def connectedComponentsDistributed(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val bidir = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheRegistry.track(bidir)

    var labels = bidir.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheRegistry.track(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate labels: own + every neighbor's current label
      val viaNeighbors = bidir
        .join(labels.select(col("id").as("dst"), col("component")), Seq("dst"))
        .select(col("src").as("id"), col("component"))
      val updated = labels.select("id", "component").unionAll(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      CacheRegistry.track(updated)
      val changed = updated.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels.unpersist(blocking = false)
      labels = updated
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"not converged after $maxIter label-propagation rounds — the " +
          "graph's diameter calls for star-contraction, not propagation")
    labels
  }

  /** Per-cluster summary over a near-dup pair relation: one row per
    * transitive duplicate GROUP (component id = keeper id = min member),
    * with member count and the largest member id. Only multi-member
    * clusters appear (singletons aren't duplicates).
    */
  def dupClusters(pairs: DataFrame, idACol: String, idBCol: String): DataFrame =
    connectedComponents(pairs, idACol, idBCol)
      .groupBy(col("component").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("id")).as("max_id"))

  /** Keep-one-per-cluster dedup: drop every row whose id appears in a
    * cluster under a smaller id (the transitive closure of the pair
    * relation, not just direct pairs).
    */
  def clusterDedup(df: DataFrame, idCol: String, pairs: DataFrame,
      idACol: String, idBCol: String): DataFrame = {
    val losers = connectedComponents(pairs, idACol, idBCol)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
