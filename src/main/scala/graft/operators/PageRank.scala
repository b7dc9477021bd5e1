package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point distributed PageRank (Brin & Page 1998) — the link-graph
  * centrality signal a web-corpus pipeline uses for crawl prioritization
  * and quality weighting (e.g. the seed-quality features in
  * CommonCrawl-derived corpora).
  *
  * Arithmetic is 64-bit fixed point: ranks live in integer units of
  * 10⁻¹⁵ (`SCALE`), every step is integer multiply / integer `div` —
  * so the result is BIT-EXACT on any engine and any partitioning, with
  * none of the decimal/double rounding-boundary hazards of float
  * iteration. Floor losses (≤ outdeg·10⁻¹⁵ per node per iteration) and
  * dangling-node leakage make the total mass drift slightly below 1.0 —
  * deliberate, documented: PageRank here is a RANKING signal, not a
  * probability distribution, and the drift is orders of magnitude below
  * any rank gap it could reorder. Overflow headroom: total mass ≤ 10¹⁵,
  * so `DAMP_NUM · sum ≤ 8.5·10¹⁶ ≪ 2⁶³`.
  *
  * Scale shape: per iteration, one equi-join of the rank relation to the
  * edge relation (both partitioned by src — the join partitioning is
  * REUSED across all iterations since edges are persisted once) and one
  * aggregation by dst; the driver sees nothing. This is the standard
  * Pregel-on-relations formulation; at 10⁹ nodes the rank relation is
  * ~16 GB — comfortably a shuffle, never a broadcast.
  */
object PageRank {

  val SCALE: Long = 1000000000000000L // 10^15

  /** Run `iters` iterations over `edges(src, dst)` and `nodes(node)`.
    * Damping is the rational `dampNum/dampDen` (default 85/100) applied
    * in integer arithmetic. Nodes absent from `edges.src` are dangling
    * (their mass leaks); nodes absent from `edges.dst` still receive the
    * teleport share. Returns `(node, pr)` with pr in `SCALE` units.
    */
  def run(
      edges: DataFrame, nodes: DataFrame, iters: Int,
      dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iters > 0, s"iters=$iters must be positive")
    require(dampNum > 0 && dampDen >= dampNum,
      s"damping $dampNum/$dampDen must be in (0,1]")
    val n = nodes.count()
    require(n > 0, "empty node set")
    // dedupe BEFORE outdeg: multi-edges collapse, so outdeg counts
    // distinct destinations (the canonical link-graph semantics)
    val ed = edges.select(col("src"), col("dst")).distinct()
    val e = CacheRegistry.track(
      ed.join(ed.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src"))
        .persist())
    e.count()
    val teleport = (SCALE / dampDen) * (dampDen - dampNum) / n
    // every iteration's rank relation is lineage-CUT ([[Lineage.cut]]):
    // pr appears twice in each step (contribution join + teleport join),
    // so a persist-only loop doubles the logical tree per iteration —
    // exponential analyzer cost (measured 45 s by iteration 5 at sf0.1)
    var pr = Lineage.cut(
      nodes.select(col("node"), lit(SCALE / n).as("pr")))
    for (_ <- 1 to iters) {
      val prev = pr
      val contrib = e.join(pr, e("src") === pr("node"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      // the rank relation doubles as the node list (same rows, and a
      // constant-size leaf) — re-joining raw `nodes` here would rescan
      // + reshuffle the source every iteration
      pr = Lineage.cut(
        pr.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(teleport) +
              expr(s"($dampNum * coalesce(s, 0L)) div $dampDen")).as("pr")))
      Lineage.release(prev) // k-1 ranks are dead once the k-th cut is real
    }
    pr
  }
}
