package graft.operators

import java.math.{BigDecimal => JBD}

import graft.SparkSpec

class PqSpec extends SparkSpec {

  /** Deterministic synthetic vectors (float-rounded like the stored
    * embeddings; 8 dims so m ∈ {1, 2, 4} all divide).
    */
  private def vecs(n: Int): Seq[(Long, Array[Double])] =
    (0L until n.toLong).map { id =>
      id -> Array.tabulate(8)(d =>
        (math.sin(id * 7 + d * 3) * 2).toFloat.toDouble)
    }

  private def toDf(data: Seq[(Long, Array[Double])]) = {
    val session = spark
    import session.implicits._
    data.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  test("m=1 product quantization degenerates to plain k-means: the " +
      "single code equals fitAssign's cluster for every vector") {
    val df = toDf(vecs(40))
    val model = Pq.fit(df, "vec_id", "embedding", dim = 8, m = 1, k = 4,
      iters = 1)
    val codes = Pq.encode(df, "embedding", model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("code")).head)
      .toMap
    val plain = KMeans.fitAssign(df, "vec_id", "embedding", k = 4, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("cluster")))
      .toMap
    assert(codes == plain)
    CacheRegistry.drain()
  }

  test("per-subspace codebooks equal fitCentroids on the sliced input, " +
      "and encode assigns each subspace independently") {
    val session = spark
    import session.implicits._
    val df = toDf(vecs(40))
    val model = Pq.fit(df, "vec_id", "embedding", dim = 8, m = 2, k = 4,
      iters = 1)
    assert(model.subDim == 4 && model.codebooks.length == 2)
    for (s <- 0 until 2) {
      val sliced = df.select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.slice(
          org.apache.spark.sql.functions.col("embedding")
            .cast("array<double>"), s * 4 + 1, 4).as("sub"))
      val want = KMeans.fitCentroids(sliced, "vec_id", "sub", 4, 1)
      assert(model.codebooks(s).map(_.toSeq).toSeq == want.map(_.toSeq).toSeq,
        s"subspace $s codebook diverged")
      val subCodes = KMeans.fitAssign(sliced, "vec_id", "sub", 4, 1)
        .collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("cluster")))
        .toMap
      val codes = Pq.encode(df, "embedding", model).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("code"))(s))
        .toMap
      assert(codes == subCodes, s"subspace $s assignment diverged")
    }
    CacheRegistry.drain()
  }

  test("adcTopK matches an exact BigDecimal reference ranking (grid " +
      "LUT arithmetic, id tie-break), including code-collision ties") {
    val data = vecs(60)
    val df = toDf(data)
    val model = Pq.fit(df, "vec_id", "embedding", dim = 8, m = 4, k = 4,
      iters = 1)
    val query = data.head._2
    val got = Pq.adcTopK(Pq.encode(df, "embedding", model), "vec_id",
        "code", model, query, topK = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // reference: same grid math, driver-side
    def grid(x: Double): JBD = JBD.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    def d2(a: Array[Double], b: Array[Double]): JBD =
      a.indices.map { i =>
        val d = grid(a(i)).subtract(grid(b(i)))
        d.multiply(d)
      }.foldLeft(JBD.ZERO)(_.add(_))
    val codes = Pq.encode(df, "embedding", model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("code")))
    val want = codes.map { case (id, code) =>
      val dist = (0 until 4).map { s =>
        d2(query.slice(s * 2, s * 2 + 2), model.codebooks(s)(code(s)))
      }.foldLeft(JBD.ZERO)(_.add(_))
      (dist, id)
    }.sortBy { case (d, id) => (d, id) }.take(15)
      .zipWithIndex.map { case ((_, id), i) => (i + 1L, id) }.toSeq
    assert(got.toSeq == want)
    // collisions exist in a 60-vector/4^4-code space rarely; at least
    // assert the ranking is total and 1-based
    assert(got.map(_._1) == (1L to 15L))
    CacheRegistry.drain()
  }

  test("ivfPqTopK == adcTopK restricted to the probed cells' members " +
      "(routing composes with scoring, changing neither)") {
    val data = vecs(60)
    val df = toDf(data)
    val model = Pq.fit(df, "vec_id", "embedding", dim = 8, m = 4, k = 4,
      iters = 1)
    val query = data.head._2
    val cents = Ann.sampleCentroids(df, "vec_id", "embedding", 6)
    val assigned = Ann.assignCells(df, "embedding", cents)
    val got = Pq.ivfPqTopK(assigned, "vec_id", "embedding", cents, model,
        query, topK = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cells = Ann.probeCells(cents, query.toSeq, 2)
    val member = assigned
      .filter(org.apache.spark.sql.functions.col("cell").isin(cells: _*))
    val want = Pq.adcTopK(Pq.encode(member, "embedding", model),
        "vec_id", "code", model, query, topK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
    // routing really pruned: some corpus vector is outside the probe set
    assert(member.count() < 60)
    CacheRegistry.drain()
  }
}
