package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import graft.SparkSpec

class KMeansSpec extends SparkSpec {

  /** Exact single-threaded reference of the operator's decimal-grid math:
    * same md5 seeding, same scale-12 grid distances (exact BigDecimal),
    * same round-9 double means — so the distributed result must match it
    * bit-for-bit, not approximately.
    */
  private def referenceAssign(
      rawData: Seq[(Long, Array[Double])], k: Int, iters: Int): Map[Long, Int] = {
    // the DataFrame side stores float32 embeddings — mirror that rounding
    val data = rawData.map { case (id, v) =>
      (id, v.map(x => x.toFloat.toDouble))
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def grid(d: Double): JBD = JBD.valueOf(d).setScale(12, RoundingMode.HALF_UP)
    def dist(v: Array[Double], c: Array[Double]): JBD =
      v.indices.map { i =>
        val diff = grid(v(i)).subtract(grid(c(i)))
        diff.multiply(diff)
      }.foldLeft(JBD.ZERO)(_.add(_))
    def assign(cents: Array[Array[Double]], v: Array[Double]): Int =
      cents.zipWithIndex.map { case (c, j) => (dist(v, c), j) }
        .min(Ordering.Tuple2(Ordering.ordered[JBD], Ordering.Int))._2

    var cents = data.map { case (id, v) => (md5hex(id.toString), id, v) }
      .sorted(Ordering.by[(String, Long, Array[Double]), (String, Long)](t => (t._1, t._2)))
      .take(k).map(_._3).toArray
    for (_ <- 0 until iters) {
      val byCluster = data.groupBy { case (_, v) => assign(cents, v) }
      cents = cents.zipWithIndex.map { case (prev, j) =>
        byCluster.get(j) match {
          case None => prev
          case Some(members) =>
            prev.indices.map { d =>
              val sum = members.map { case (_, v) => grid(v(d)) }
                .foldLeft(JBD.ZERO)(_.add(_))
              val mean = sum.doubleValue() / members.size.toDouble
              JBD.valueOf(mean).setScale(9, RoundingMode.HALF_UP).doubleValue()
            }.toArray
        }
      }
    }
    data.map { case (id, v) => id -> assign(cents, v) }.toMap
  }

  private def blobs(): Seq[(Long, Array[Double])] = {
    val centers = Seq(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0))
    (0L until 30L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.zipWithIndex.map { case (x, d) => x + (i * 7 + d) % 13 * 0.003 })
    }
  }

  private def toDf(data: Seq[(Long, Array[Double])]) = {
    val session = spark
    import session.implicits._
    data.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  test("fitAssign matches the exact BigDecimal reference bit-for-bit " +
      "across iteration counts (incl. iters=0 seed assignment)") {
    val data = blobs()
    for (iters <- Seq(0, 1, 3)) {
      val got = KMeans.fitAssign(toDf(data), "vec_id", "embedding", k = 3, iters)
        .select("vec_id", "cluster").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == referenceAssign(data, k = 3, iters = iters),
        s"diverged from exact reference at iters=$iters")
    }
  }

  test("well-separated blobs cluster purely after one update, and the " +
      "assignment is deterministic across runs") {
    val data = blobs()
    def run() = KMeans.fitAssign(toDf(data), "vec_id", "embedding", 3, 1)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = run()
    // purity: every member of a blob lands in the same cluster, and the 3
    // blobs use 3 distinct clusters
    val blobToCluster = data.groupBy(_._1 % 3)
      .map { case (b, members) => b -> members.map(m => a(m._1)).distinct }
    assert(blobToCluster.values.forall(_.size == 1), s"impure: $blobToCluster")
    assert(blobToCluster.values.flatten.toSet.size == 3)
    assert(run() == a)
  }

  test("the fast (codegen dot-product) tier assigns identically to the " +
      "exact decimal tier on blobs and on pseudo-random vectors") {
    // deterministic LCG vectors shaped like the real embeddings table
    var s = 0x2545f4914f6cdd1dL
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 20).toDouble / (1L << 44).toDouble - 0.5
    }
    val rand = (0L until 200L).map(i => (i, Array.fill(16)(next())))
    for ((data, k) <- Seq((blobs(), 3), (rand, 8)); iters <- Seq(0, 2)) {
      def run(exact: Boolean) =
        KMeans.fitAssign(toDf(data), "vec_id", "embedding", k, iters, exact)
          .select("vec_id", "cluster").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(run(exact = true) == run(exact = false),
        s"tiers diverged at k=$k iters=$iters")
    }
  }

  test("semanticDedup kills planted clones but keeps mutually-orthogonal " +
      "originals; on tight blobs it prunes each cluster to its min-id " +
      "representative") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions.col
    // orthogonal one-hot vectors: zero organic cosine, so exactly the
    // clones die
    val ortho = (0L until 12L).map { i =>
      (i, Array.tabulate(12)(d => if (d == i) 1.0 else 0.0))
    }
    val base = toDf(ortho)
    val cloned = base.select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val out = KMeans.semanticDedup(base.unionAll(cloned), "vec_id", "embedding",
        k = 3, iters = 1, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(out == ortho.map(_._1).toSet,
      s"expected exactly the originals to survive: $out")
    // tight blobs: intra-blob cosines clear 0.99, blobs map 1:1 to
    // clusters (purity test above), so SemDeDup keeps one representative
    // (the min id — survival = no smaller-id near neighbor) per cluster
    val pruned = KMeans.semanticDedup(toDf(blobs()), "vec_id", "embedding",
        k = 3, iters = 1, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(pruned == Set(0L, 1L, 2L),
      s"expected one min-id representative per blob: $pruned")
  }

  test("semanticDedup survives a degenerate all-identical corpus: the " +
      "exact-dup collapse keeps the pair join at one representative, and " +
      "exactly the min id survives") {
    val session = spark
    import session.implicits._
    // 4000 bit-identical vectors: unguarded this is an 8M-pair join in
    // one cluster; collapsed it is one group and ZERO join pairs
    val clones = (0L until 4000L).map(i => (i, Array(0.6, 0.3, 0.1, 0.2)))
    val out = KMeans.semanticDedup(toDf(clones), "vec_id", "embedding",
        k = 2, iters = 1, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(0L), s"expected only the min id to survive: $out")
  }

  test("semanticDedup sub-buckets an oversized cluster of DISTINCT " +
      "vectors: completes under a tiny cap, planted exact dups still die " +
      "(vector-hash bucketing co-locates them), and mutually-far vectors " +
      "all survive") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions.col
    // 120 mutually-orthogonal-ish vectors (cosine 0 pairwise) that k=1
    // forces into ONE cluster of 120 reps — far over a cap of 10, so the
    // pair join must run per (cluster, xxhash64-bucket)
    val distinct0 = (0L until 120L).map { i =>
      (i, Array.tabulate(120)(d => if (d == i) 1.0 else 0.0))
    }
    val base = toDf(distinct0)
    val cloned = base.select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val out = KMeans.semanticDedup(base.unionAll(cloned), "vec_id", "embedding",
        k = 1, iters = 0, threshold = 0.99, maxClusterSize = 10)
      .select("vec_id").as[Long].collect().toSet
    // every clone dies (exact collapse, bucket-independent); every
    // orthogonal original survives (cosine 0 < threshold in any bucket)
    assert(out == distinct0.map(_._1).toSet,
      s"expected exactly the originals to survive: $out")
  }

  test("the sub-bucket guard never engages below the cap: a corpus under " +
      "maxClusterSize gives byte-identical survivors with and without a " +
      "binding cap, and maxClusterSize must be positive") {
    val session = spark
    import session.implicits._
    def run(cap: Int) =
      KMeans.semanticDedup(toDf(blobs()), "vec_id", "embedding",
          k = 3, iters = 1, threshold = 0.99, maxClusterSize = cap)
        .select("vec_id").as[Long].collect().toSet
    // blobs give 3 clusters of 10 members: cap 11 is the tightest
    // non-binding cap (ceil(10/11) = 1 sub-bucket)
    assert(run(10000) == run(11), "a non-binding cap changed the result")
    intercept[IllegalArgumentException] {
      KMeans.semanticDedup(toDf(blobs()), "vec_id", "embedding",
        k = 3, iters = 1, threshold = 0.99, maxClusterSize = 0)
    }
  }

  test("the exact tier rejects out-of-grid coordinates (|x| >= 10) with " +
      "a message naming the domain, instead of a bare cast overflow") {
    val data = Seq(
      (1L, Array(0.5, 0.5)), (2L, Array(0.1, 0.2)),
      (3L, Array(15.0, 0.0))) // out of the scale-12 grid's 2 int digits
    val e = intercept[Exception] {
      KMeans.fitAssign(toDf(data), "vec_id", "embedding", 2, 0).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("|coordinate| < 10")), e.toString)
    // the fast tier has no grid and must accept the same data
    val ok = KMeans.fitAssign(toDf(data), "vec_id", "embedding", 2, 0,
      exact = false).collect()
    assert(ok.length == 3)
  }

  test("the exact tier fails LOUDLY on a null coordinate (position " +
      "named) instead of silently reading it as 0.0") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1, 4).select(col("id").as("vec_id"),
      array(lit(0.5),
        when(col("id") === 2, lit(null).cast("double"))
          .otherwise(lit(0.25))).as("embedding"))
    val e = intercept[Exception] {
      KMeans.fitAssign(df, "vec_id", "embedding", 2, 0).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null coordinate at index 1")),
      e.toString)
  }

  test("k larger than distinct seeds available is rejected; empty " +
      "clusters keep their previous centroid rather than crashing") {
    val data = blobs().take(4)
    intercept[IllegalArgumentException] {
      KMeans.fitAssign(toDf(data), "vec_id", "embedding", k = 9, iters = 1)
    }
    // k=4 on 4 points: after the update at least one cluster can go
    // empty (two seeds may share a blob); the run must still complete
    // and assign every point
    val got = KMeans.fitAssign(toDf(data), "vec_id", "embedding", 4, 2)
      .select("vec_id", "cluster").collect()
    assert(got.length == 4)
    assert(got.map(_.getInt(1)).forall(c => c >= 0 && c < 4))
  }
}
