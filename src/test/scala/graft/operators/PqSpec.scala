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

  test("IVFADC residual encoding beats raw-vector codes at equal code " +
      "budget on a planted-cluster fixture (the Jégou §IV argument), " +
      "and encodeResiduals codes differ from raw codes") {
    val session = spark
    import session.implicits._
    // 3 tight blobs around far-apart centers: raw PQ spends its
    // codewords separating the blobs (within-blob displacement
    // collapses to one code → id-tie-break ranking), residual PQ
    // spends them on the pooled within-blob displacement
    // orthogonal Walsh sign patterns scaled to ±4: cosine-separable
    // (assignCells routes by cosine, so collinear centers would
    // scatter the middle blob), coordinates at most 8 apart so the
    // grid's |coordinate| < 10 bound also holds for the QUERY residual
    // against the farthest probed cell
    val signs = Seq(
      Seq(1, 1, 1, 1, -1, -1, -1, -1),
      Seq(1, -1, 1, -1, 1, -1, 1, -1),
      Seq(-1, -1, 1, 1, -1, -1, 1, 1))
    val centers = signs.map(s => s.map(_ * 4.0).toArray)
    val data = (0L until 150L).map { id =>
      val c = centers((id % 3).toInt)
      id -> Array.tabulate(8)(d =>
        (c(d) + 0.8 * math.sin(id * (d * 7 + 3) * 1.618)).toFloat.toDouble)
    }
    val df = data.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val cents = centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    val assigned = Ann.assignCells(df, "embedding", cents)
    // k=4 on 3 blobs: the raw codebook spends nearly all its codewords
    // separating blobs (4 codewords vs 3 far-apart centers leaves at
    // most one blob any within-blob resolution); the residual codebook
    // spends all 4 on the pooled within-blob displacement
    val raw = Pq.fit(df, "vec_id", "embedding", dim = 8, m = 4, k = 4,
      iters = 2)
    val res = Pq.fitResiduals(assigned, "vec_id", "embedding", "cell",
      cents, dim = 8, m = 4, k = 4, iters = 2)
    // average recall@10 over queries in all three cells — a single
    // query's recall is ±0.1-noise from id tie-breaks
    val queryIds = Seq(30, 31, 47, 60, 95)
    val recalls = queryIds.map { qid =>
      val query = data(qid)._2.map(_ + 0.01)
      // exact truth: double L2 over the stored (float-rounded) vectors
      val truth = data.map { case (id, v) =>
        id -> v.indices.map(i => (v(i) - query(i)) * (v(i) - query(i))).sum
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      def recall(topk: Seq[Long]): Double =
        topk.count(truth).toDouble / truth.size
      val rawTop = Pq.ivfPqTopK(assigned, "vec_id", "embedding", cents,
          raw, query, topK = 10, nprobe = 3)
        .collect().map(_.getLong(1)).toSeq
      val resTop = Pq.ivfAdcTopK(assigned, "vec_id", "embedding", "cell",
          cents, res, query, topK = 10, nprobe = 3)
        .collect().map(_.getLong(1)).toSeq
      (recall(rawTop), recall(resTop))
    }
    val rr = recalls.map(_._1).sum / recalls.size
    val rres = recalls.map(_._2).sum / recalls.size
    info(s"mean recall@10 over ${queryIds.size} queries: " +
      s"raw=$rr residual=$rres (per-query: $recalls)")
    assert(rres > rr,
      s"residual recall $rres must beat raw recall $rr on this fixture")
    assert(rres >= 0.5, s"residual recall $rres unexpectedly low")
    // the residual codes really are different codes, not a relabeling
    val rawCodes = Pq.encode(df, "embedding", raw)
      .select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val resCodes = Pq.encodeResiduals(assigned, "embedding", "cell",
        cents, res)
      .select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(rawCodes.keySet == resCodes.keySet)
    assert(rawCodes.exists { case (id, c) => resCodes(id) != c })
    CacheRegistry.drain()
  }

  test("adcTopK and ivfAdcTopK REFUSE m >= 10 (the DECIMAL(30,24) " +
      "headroom bound) instead of silently rounding the exact ranking") {
    val session = spark
    import session.implicits._
    val data = (0L until 12L).map { id =>
      id -> Array.tabulate(20)(d => math.sin(id + d).toFloat)
    }
    val df = data.toDF("vec_id", "embedding")
    val model = Pq.fit(df, "vec_id", "embedding", dim = 20, m = 10, k = 2,
      iters = 1)
    val query = data.head._2.map(_.toDouble)
    val codes = Pq.encode(df, "embedding", model)
    val ex = intercept[IllegalArgumentException] {
      Pq.adcTopK(codes, "vec_id", "code", model, query, topK = 3)
    }
    assert(ex.getMessage.contains("m=10"))
    val cents = Seq((0, Seq.fill(20)(0.0)), (1, Seq.fill(20)(1.0)))
    val ex2 = intercept[IllegalArgumentException] {
      Pq.ivfAdcTopK(Ann.assignCells(df, "embedding", cents), "vec_id",
        "embedding", "cell", cents, model, query, topK = 3, nprobe = 1)
    }
    assert(ex2.getMessage.contains("m=10"))
    CacheRegistry.drain()
  }

  test("the array-literal LUT has no probes*m*k ceiling: the envelope " +
      "the old when-chain refused (9*8*64 = 4608 branches-worth) now " +
      "EXECUTES, and the live ranker agrees with the store probe " +
      "row-for-row") {
    val session = spark
    import session.implicits._
    // 9 cells * m=8 * k=64 = 4608 — past the old MaxAdcWhenBranches
    // cliff, where the when-chain provably fell out of whole-stage
    // codegen (r12 red spec); the flat-LUT map literal is O(m)
    // bytecode so the same configuration simply runs
    val m = 8
    val k = 64
    val model = Pq.Model(m, 1,
      Array.tabulate(m, k, 1)((_, j, _) => j * 0.01))
    val centroids = (0 until 9).map(c => c -> Seq.fill(8)(c * 0.05))
    val df = (1L to 20L)
      .map(i => (i, Array.fill(8)((i % 5) * 0.04))).toDF("id", "vec")
    val query = Array.fill(8)(0.03)
    val live = Pq.ivfAdcTopK(Ann.assignCells(df, "vec", centroids),
        "id", "vec", "cell", centroids, model, query, topK = 3,
        nprobe = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(live.size == 3, live.toString)
    val dir = java.nio.file.Files.createTempDirectory("adc-bound")
      .toString
    Pq.writeIvfAdcIndex(df, "id", "vec", centroids, model, dir)
    val probed = Pq.probeIvfAdcStore(spark, dir, "id", centroids,
        model, query, topK = 3, nprobe = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(live == probed, s"live=$live probed=$probed")
    CacheRegistry.drain()
  }

  test("fit FAILS FAST on a training vector whose length != dim — no " +
      "silently truncated subspace training") {
    val session = spark
    import session.implicits._
    val good = (0L until 10L).map(id =>
      id -> Array.tabulate(8)(d => math.sin(id + d).toFloat))
    val bad = Seq(99L -> Array.tabulate(7)(d => d.toFloat))
    val df = (good ++ bad).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pq.fit(df, "vec_id", "embedding", dim = 8, m = 2, k = 2, iters = 1)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("pq fit: vector length")),
      s"unexpected failure: $ex")
    CacheRegistry.drain()
  }
}
