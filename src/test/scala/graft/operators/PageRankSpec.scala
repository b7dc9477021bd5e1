package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the fixed-point PageRank against a naive driver-side reference
  * with the identical integer arithmetic, on random graphs with
  * multi-edges, dangling nodes, and in-degree-0 nodes.
  */
class PageRankSpec extends SparkSpec {

  private def refPageRank(
      edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int): Map[Long, Long] = {
    val ed = edges.distinct
    val outdeg = ed.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val n = nodes.size.toLong
    val teleport = (PageRank.SCALE / 100) * 15 / n
    var pr: Map[Long, Long] = nodes.map(_ -> PageRank.SCALE / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
      for ((s, d) <- ed)
        contrib(d) = contrib.getOrElse(d, 0L) + pr(s) / outdeg(s)
      pr = nodes.map(v =>
        v -> (teleport + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    pr
  }

  test("run matches the integer-arithmetic reference on random graphs " +
      "with multi-edges and dangling nodes") {
    import spark.implicits._
    for (seed <- Seq(3, 21)) {
      val rnd = new scala.util.Random(seed)
      val nodes = (0L until 20L).toSeq
      // multi-edges on purpose: run() must dedupe before outdeg
      val edges = Seq.fill(60)((rnd.nextInt(15).toLong, rnd.nextInt(20).toLong))
      val got = PageRank.run(
          edges.toDF("src", "dst"), nodes.toDF("node"), iters = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = refPageRank(edges, nodes, 5)
      assert(got == want, s"seed=$seed\n got=${got.toSeq.sorted}\n" +
        s"want=${want.toSeq.sorted}")
      CacheRegistry.drain()
    }
  }

  test("mass conservation envelope: total rank stays in (0, SCALE] and " +
      "every node keeps at least the teleport share") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val nodes = (1L to 6L).toDF("node") // 5,6 isolated; 4 dangling-free src
    val pr = PageRank.run(edges, nodes, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = pr.values.sum
    assert(total > 0 && total <= PageRank.SCALE, total.toString)
    val teleport = (PageRank.SCALE / 100) * 15 / 6
    assert(pr.values.forall(_ >= teleport), pr.toString)
    // isolated nodes sit exactly at the teleport floor
    assert(pr(5L) == teleport && pr(6L) == teleport, pr.toString)
    CacheRegistry.drain()
  }

  test("plan shape: iteration joins are equi-joins on src/node, never " +
      "cartesian or nested-loop") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val nodes = (1L to 3L).toDF("node")
    val pr = PageRank.run(edges, nodes, iters = 2)
    val plan = pr.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    CacheRegistry.drain()
  }
}
