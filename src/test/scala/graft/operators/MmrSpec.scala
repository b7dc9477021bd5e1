package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MmrSpec extends SparkSpec {

  private def toDf(data: Seq[(Long, Array[Double])]) = {
    val session = spark
    import session.implicits._
    data.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  // query along e1; doc 2 is a colinear clone of doc 1 (cosine 1 with
  // it AND with the query), doc 3 half as relevant but diverse
  private val data = Seq(
    1L -> Array(1.0, 0.0, 0.0),
    2L -> Array(0.9, 0.0, 0.0),
    3L -> Array(0.5, 0.0, 0.8))
  private val query = Seq(1.0, 0.0, 0.0)

  test("diversity beats raw relevance: the colinear clone of pick 1 is " +
      "deferred behind the diverse candidate") {
    // step 2 closed form (sims: q2=s21=1, q3=s31=cos(3,1)):
    // mmr(2) = 0.3·1 − 0.7·1 = −0.4;  mmr(3) = −0.4·cos(3,1) ≈ −0.21
    val out = Ann.mmrRerank(toDf(data), "vec_id", "embedding", query,
      m = 3, k = 3, lambda = 0.3).orderBy("rank").collect()
    val picks = out.map(_.getAs[Long]("vec_id")).toSeq
    // pure relevance would give 1, 2, 3 (qsim ties 1=2, id breaks)
    assert(picks == Seq(1L, 3L, 2L), s"got $picks")
  }

  test("lambda = 1 reduces to pure relevance order") {
    val out = Ann.mmrRerank(toDf(data), "vec_id", "embedding", query,
      m = 4, k = 4, lambda = 1.0).orderBy("rank").collect()
    val picks = out.map(_.getAs[Long]("vec_id")).toSeq
    val byRelevance = Ann.bruteForceTopK(toDf(data), "vec_id", "embedding",
      query, 4).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(picks == byRelevance)
  }

  test("exact duplicates tie-break to the smaller id and k bounds " +
      "the output; invalid m/k/lambda are refused") {
    val dup = Seq(
      7L -> Array(1.0, 0.0), 5L -> Array(1.0, 0.0), 9L -> Array(0.0, 1.0))
    val out = Ann.mmrRerank(toDf(dup), "vec_id", "embedding",
      Seq(1.0, 0.0), m = 3, k = 2, lambda = 0.7).orderBy("rank").collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("vec_id") == 5L) // tie 5 vs 7 -> smaller id
    intercept[IllegalArgumentException] {
      Ann.mmrRerank(toDf(dup), "vec_id", "embedding", Seq(1.0, 0.0),
        m = 1, k = 2, lambda = 0.7)
    }
    intercept[IllegalArgumentException] {
      Ann.mmrRerank(toDf(dup), "vec_id", "embedding", Seq(1.0, 0.0),
        m = 3, k = 2, lambda = 1.5)
    }
  }

  test("a duplicate id in the slate is refused up front with the id " +
      "named — not a NoSuchElementException mid-selection") {
    val dupIds = Seq(
      4L -> Array(1.0, 0.0), 4L -> Array(0.9, 0.1), 6L -> Array(0.0, 1.0))
    val e = intercept[IllegalArgumentException] {
      Ann.mmrRerank(toDf(dupIds), "vec_id", "embedding", Seq(1.0, 0.0),
        m = 3, k = 3, lambda = 0.5)
    }
    assert(e.getMessage.contains("distinct ids") &&
      e.getMessage.contains("4"), e.getMessage)
  }

  test("ivfMmrRerank equals mmrRerank over the probed-cell restriction, " +
      "and the pruning genuinely binds (an unprobed cell's vector is " +
      "excluded even when it would out-rank every pick)") {
    // two far-apart clusters; centroids = first 2 vectors by id, so
    // cluster A (e1-ish) -> cell 0, cluster B (e2-ish) -> cell 1
    val vecs = Seq(
      1L -> Array(1.0, 0.0, 0.0), 2L -> Array(0.0, 1.0, 0.0),
      3L -> Array(0.9, 0.1, 0.0), 4L -> Array(0.95, 0.0, 0.1),
      5L -> Array(0.1, 0.9, 0.0), 6L -> Array(0.0, 0.98, 0.05))
    val df = toDf(vecs)
    val cents = Ann.sampleCentroids(df, "vec_id", "embedding", 2)
    val assigned = Ann.assignCells(df, "embedding", cents)
    val q = Seq(0.0, 1.0, 0.0) // dead-on cluster B
    val got = Ann.ivfMmrRerank(assigned, "vec_id", "embedding", cents, q,
        nprobe = 1, m = 3, k = 3, lambda = 0.7)
      .orderBy("rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    val probed = Ann.probeCells(cents, q, 1)
    val want = Ann.mmrRerank(
        assigned.filter(col("cell").isin(probed: _*)),
        "vec_id", "embedding", q, m = 3, k = 3, lambda = 0.7)
      .orderBy("rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got == want, "must equal MMR over the probed restriction")
    assert(got.toSet == Set(2L, 5L, 6L),
      s"only cluster B's cell is probed, got $got")
    CacheRegistry.drain()
  }
}
