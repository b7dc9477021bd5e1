package graft.operators

import org.apache.spark.sql.functions.{col, row_number}

import graft.SparkSpec

class AnnSpec extends SparkSpec {

  test("knnGraph: every node gets k neighbors, best neighbor is the nearest") {
    val g = Ann.knnGraph(vecs(), "vec_id", "embedding", 3).collect()
    assert(g.length == 100 * 3)
    // node 7's rank-1 neighbor must be the global argmax cosine vs node 7
    val brute = Ann.bruteForceTopK(
      vecs().filter(org.apache.spark.sql.functions.col("vec_id") =!= 7L),
      "vec_id", "embedding",
      (0 until 16).map(j => math.sin(7 * 0.7 + j)).toSeq, 1).collect()(0)
    val g7 = g.filter(r => r.getAs[Long]("id") == 7L)
      .minBy(_.getAs[Int]("rnk"))
    assert(g7.getAs[Long]("nbr") == brute.getAs[Long]("vec_id"))
  }

  test("groupCentroids: decimal-exact per-dimension means") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)),
      (1, Array(10.0f, 20.0f)))
      .toDF("label", "embedding")
    val out = VectorOps.groupCentroids(df, "label", "embedding")
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim")) ->
        (r.getAs[Double]("centroid"), r.getAs[Long]("n"))).toMap
    assert(out((0, 0)) == ((2.0, 2L)))
    assert(out((0, 1)) == ((3.0, 2L)))
    assert(out((1, 0)) == ((10.0, 1L)))
    assert(out((1, 1)) == ((20.0, 1L)))
  }

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

  test("ivfTopKBatch equals a per-query ivfTopK loop: the declarative " +
      "routing relation reproduces probeCells' tie rule exactly") {
    import spark.implicits._
    val df = vecs()
    val cents = Ann.sampleCentroids(df, "vec_id", "embedding", 4)
    val assigned = Ann.assignCells(df, "embedding", cents)
    val queries = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qvec"))
    val batch = Ann.ivfTopKBatch(assigned, "vec_id", "embedding", cents,
        queries, "qid", "qvec", k = 5, nprobe = 2)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk")) ->
        r.getAs[Long]("vec_id")).toMap
    for (q <- queries.collect()) {
      val qid = q.getAs[Long]("qid")
      val qv = q.getSeq[Double](1)
      val loop = Ann.ivfTopK(assigned, "vec_id", "embedding", cents,
          qv, k = 5, nprobe = 2)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      val got = (1 to loop.length).map(r => batch((qid, r)))
      assert(got == loop, s"qid=$qid: batch $got != loop $loop")
    }
  }

  test("ivfScoredCandidates at the ladder ceiling re-ranks to EXACTLY " +
      "ivfTopKBatch at every smaller nprobe (probe_rank filter = the " +
      "nprobe-p candidate set)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = vecs()
    val cents = Ann.sampleCentroids(df, "vec_id", "embedding", 4)
    val assigned = Ann.assignCells(df, "embedding", cents)
    val queries = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qvec"))
    val scored = Ann.ivfScoredCandidates(assigned, "vec_id", "embedding",
      cents, queries, "qid", "qvec", nprobe = 4)
    for (p <- Seq(1, 2, 4)) {
      val viaSweep = scored.filter(col("probe_rank") <= p)
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("cosine").desc, col("vec_id").asc)))
        .filter(col("rnk") <= 5)
        .collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk"),
          r.getAs[Long]("vec_id"))).toSet
      val direct = Ann.ivfTopKBatch(assigned, "vec_id", "embedding",
          cents, queries, "qid", "qvec", k = 5, nprobe = p)
        .collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk"),
          r.getAs[Long]("vec_id"))).toSet
      assert(viaSweep == direct, s"nprobe=$p: sweep != direct")
    }
  }

  test("jlProject matches a scalar replay of the md5 sign matrix and " +
      "the left-to-right fold; invalid dims are refused") {
    import spark.implicits._
    def sign(i: Int, j: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$i:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
    val data = Seq(
      1L -> Array(1.0, 2.0, -3.0, 0.5, 0.0, 4.0, -1.0, 2.5),
      2L -> Array.fill(8)(0.0),
      3L -> (0 until 8).map(i => math.sin(i.toDouble)).toArray)
    val df = data.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val got = Ann.jlProject(df, "vec_id", "embedding", inDim = 8, outDim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("projected")).toMap
    for ((id, v) <- data; j <- 0 until 4) {
      // the engine folds left-to-right: ((0 + s0·v0) + s1·v1) + ...
      var acc = 0.0
      for (i <- 0 until 8) acc += sign(i, j) * v(i)
      val want = acc / math.sqrt(4.0)
      assert(got(id)(j) == want, s"id=$id j=$j: ${got(id)(j)} != $want")
    }
    intercept[IllegalArgumentException] {
      Ann.jlProject(df, "vec_id", "embedding", inDim = 8, outDim = 9)
    }
  }
}
