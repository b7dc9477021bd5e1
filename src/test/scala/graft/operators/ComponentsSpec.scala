package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("id_a", "id_b")
  }

  test("components: chain, clique, and isolated pair resolve to min labels") {
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, pair 20-21
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L))
    val cc = Components.connectedComponents(e, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    CacheRegistry.drain()
  }

  test("label direction matters: min label must flow AGAINST edge " +
      "direction too (undirected closure)") {
    // edges listed so the small id is on the b side
    val cc = Components.connectedComponents(
        edges((5L, 1L), (6L, 5L)), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 5L -> 1L, 6L -> 1L))
    CacheRegistry.drain()
  }

  test("dupClusters summarizes transitive groups (not just direct pairs)") {
    val clusters = Components.dupClusters(
        edges((1L, 2L), (2L, 3L), (10L, 11L)), "id_a", "id_b")
      .orderBy("cluster_id").collect()
    assert(clusters.length == 2)
    assert(clusters(0).getLong(0) == 1L && clusters(0).getLong(1) == 3L &&
      clusters(0).getLong(2) == 3L)
    assert(clusters(1).getLong(0) == 10L && clusters(1).getLong(1) == 2L &&
      clusters(1).getLong(2) == 11L)
    CacheRegistry.drain()
  }

  test("clusterDedup keeps exactly one member per transitive cluster") {
    import spark.implicits._
    val df = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = Components.clusterDedup(
        df, "doc_id", edges((1L, 2L), (2L, 3L), (5L, 6L)), "id_a", "id_b")
      .collect().map(_.getLong(0)).sorted.toSeq
    // cluster {1,2,3} -> keep 1; {5,6} -> keep 5; 4 untouched
    assert(kept == Seq(1L, 4L, 5L))
    CacheRegistry.drain()
  }

  test("an unstable round budget fails loudly instead of returning a " +
      "partial labeling (distributed path)") {
    val chain = edges((1L to 200L).map(i => (i, i + 1)): _*)
    val err = intercept[IllegalStateException] {
      Components.connectedComponentsDistributed(chain, "id_a", "id_b", maxIter = 1)
    }
    assert(err.getMessage.contains("fixpoint"))
    CacheRegistry.drain()
  }

  test("star contraction (distributed) matches driver union-find on " +
      "chains, cliques, and seeded random graphs — O(log n) rounds") {
    // long chain: the worst case for label propagation, easy for stars
    val chain = edges((1L to 60L).map(i => (i, i + 1)): _*)
    val chainDist = Components.connectedComponentsDistributed(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainDist.keySet == (1L to 61L).toSet)
    assert(chainDist.values.forall(_ == 1L))
    CacheRegistry.drain()

    // seeded random graph: distributed == union-find, exactly
    val rnd = new scala.util.Random(42)
    val randomPairs = (1 to 120).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
    }.filter { case (a, b) => a != b }
    val e = edges(randomPairs: _*)
    val dist = Components.connectedComponentsDistributed(e, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Components.localUnionFind(randomPairs.toArray)
    assert(dist == local)
    CacheRegistry.drain()
  }

  test("local union-find dispatch and the distributed path produce the " +
      "same labeling; tiny localEdgeLimit forces the scale path") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (7L, 1L))
    val local = Components.connectedComponents(e, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Components.connectedComponents(e, "id_a", "id_b",
        localEdgeLimit = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    CacheRegistry.drain()
  }

  test("over-cap edge sets take the contraction path off a count probe " +
      "(no driver collect) and labels stay correct; absurd caps are " +
      "rejected up front") {
    import spark.implicits._
    // one 41-node chain = 40 edges, cap 10 -> the distributed branch
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Components.connectedComponents(chain, "id_a", "id_b",
        localEdgeLimit = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 41 && out.values.forall(_ == 0L))
    // a cap the local tier cannot represent fails fast instead of
    // overflowing (the old probe's (cap+1).toInt wrapped negative)
    intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, "id_a", "id_b",
        localEdgeLimit = Int.MaxValue.toLong)
    }
    intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, "id_a", "id_b",
        localEdgeLimit = Long.MaxValue)
    }
    CacheRegistry.drain()
  }
}
