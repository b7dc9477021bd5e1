package graft.operators

import graft.SparkSpec

class AnnSpec extends SparkSpec {

  private def vecs() = {
    import spark.implicits._
    (0 until 100).map { i =>
      val base = Array.tabulate(16)(j => math.sin(i * 0.7 + j).toFloat)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
  }

  test("brute-force top-k: query vector finds itself first at cosine 1") {
    val q = (0 until 16).map(j => math.sin(7 * 0.7 + j)).toSeq
    val top = Ann.bruteForceTopK(vecs(), "vec_id", "embedding", q, 5).collect()
    assert(top.head.getAs[Long]("vec_id") == 7L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-6)
    // scores non-increasing
    val scores = top.map(_.getAs[Double]("cosine"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("IVF with all cells probed matches brute force exactly") {
    val df = vecs()
    val q = (0 until 16).map(j => math.sin(13 * 0.7 + j)).toSeq
    val cents = Ann.sampleCentroids(df, "vec_id", "embedding", 8)
    val assigned = Ann.assignCells(df, "embedding", cents)
    val ivf = Ann.ivfTopK(assigned, "vec_id", "embedding", cents, q, 10, nprobe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val bf = Ann.bruteForceTopK(df, "vec_id", "embedding", q, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivf == bf)
  }

  test("IVF with nprobe=2 still finds the exact self-match") {
    val df = vecs()
    val q = (0 until 16).map(j => math.sin(42 * 0.7 + j)).toSeq
    val cents = Ann.sampleCentroids(df, "vec_id", "embedding", 8)
    val assigned = Ann.assignCells(df, "embedding", cents)
    val ivf = Ann.ivfTopK(assigned, "vec_id", "embedding", cents, q, 3, nprobe = 2)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(ivf.contains(42L))
  }

  test("batch top-k per query via window") {
    import spark.implicits._
    val queries = Seq(
      (0L, (0 until 16).map(j => math.sin(0 * 0.7 + j).toDouble).toArray),
      (1L, (0 until 16).map(j => math.sin(50 * 0.7 + j).toDouble).toArray))
      .toDF("qid", "qvec")
    val out = Ann.bruteForceTopKBatch(vecs(), "vec_id", "embedding",
      queries, "qid", "qvec", 3).collect()
    assert(out.length == 6)
    val q0best = out.filter(_.getAs[Long]("qid") == 0L)
      .minBy(_.getAs[Int]("rnk"))
    assert(q0best.getAs[Long]("vec_id") == 0L)
  }
}
