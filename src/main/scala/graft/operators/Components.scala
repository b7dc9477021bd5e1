package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — the cluster-resolution
  * stage every near-dup pipeline needs after pair generation (pairs say
  * "a~b"; dedup needs "keep one representative per transitive GROUP").
  *
  * Two tiers: edge sets under a cap collect to driver union-find (pair
  * relations are output-sized — usually tiny next to the corpus); past
  * the cap, alternating large-star/small-star contraction (Kiveris et
  * al., SoCC'14) runs distributed in O(log n) rounds regardless of
  * topology.
  *
  * Labels converge to each component's MINIMUM node id either way, which
  * makes the output deterministic and oracle-friendly (component ==
  * keeper id under keep-smallest-id dedup).
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
    require(localEdgeLimit > 0 && localEdgeLimit < Int.MaxValue,
      s"localEdgeLimit=$localEdgeLimit must be in (0, Int.MaxValue) — the " +
        "local tier collects edges into one array")
    // Size probe WITHOUT hauling rows to the driver: cap the relation at
    // limit+1 and COUNT it executor-side. The capped relation is
    // persisted so the under-cap branch's collect() reuses the same rows
    // instead of recomputing pair generation (the expensive upstream).
    // Over the cap, only a count crossed the wire — an oversized edge
    // set can no longer OOM the driver just by being probed.
    val capped = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .limit(localEdgeLimit.toInt + 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (capped.count() <= localEdgeLimit) {
        val spark = edges.sparkSession
        import spark.implicits._
        val probe = capped.collect()
        localUnionFind(probe.map(r => (r.getLong(0), r.getLong(1))))
          .toSeq.toDF("id", "component")
      } else connectedComponentsDistributed(edges, srcCol, dstCol, maxIter)
    } finally capped.unpersist(false)
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

  /** The scale path: alternating large-star / small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — O(log n) rounds on ANY topology, unlike min-label
    * propagation whose round count is the graph diameter. Each round is
    * two groupBy+join passes; convergence = the edge set reaching a
    * fixpoint of node→component-minimum star edges.
    */
  def connectedComponentsDistributed(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession

    // large-star: every node attaches its STRICTLY LARGER neighbors to
    // the minimum of its closed neighborhood
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = bidir.groupBy("src").agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      bidir.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }

    // small-star: edges oriented large→small; every node attaches its
    // smaller-or-equal neighbors (and itself) to the neighborhood minimum
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val mins = oriented.groupBy("src").agg(min(col("dst")).as("m"))
      val nbrs = oriented.join(mins, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
      val self = mins.select(col("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
      nbrs.unionAll(self).distinct()
    }

    // ANSI mode throws on long-sum overflow, so the hash is masked to 32
    // bits before summing (2^32 rows of 2^32 values stays inside 2^63)
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("src"), col("dst"))
          .bitwiseAND(lit(0xffffffffL))), lit(0L)).as("h"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // Lineage.cut truncates the logical plan each round — without it
    // the nested join/distinct lineage makes Catalyst analysis cost
    // grow superlinearly with the round count (the standard
    // iterative-DataFrame trap); the shared helper also registers the
    // checkpoint blocks with CacheRegistry and the previous round's
    // blocks are released as soon as the next round is materialized
    var e = Lineage.cut(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")))
    var sig = checksum(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prev = e
      val next = Lineage.cut(smallStar(largeStar(e)))
      val nextSig = checksum(next)
      e = next
      Lineage.release(prev)
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not reach a fixpoint in $maxIter rounds " +
          "(expected O(log n)) — the edge relation is unstable")
    // fixpoint edges are star edges node→component-min; roots label themselves
    val members = e.select(col("src").as("id"), col("dst").as("component"))
    val roots = e.select(col("dst").as("id")).distinct()
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    members.unionAll(roots)
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
