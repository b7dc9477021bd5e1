package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near dup of 1
      (4L, "completely different content about spark query engines and shuffles"),
      (5L, "another unrelated document mentioning aggregation pipelines only"))
      .toDF("doc_id", "text")
  }

  test("exact dedup keeps smallest id per fingerprint") {
    val groups = Dedup.exactGroups(corpus(), "doc_id", "text").collect()
    val dupGroup = groups.find(_.getAs[Long]("dup_cnt") == 2L).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
    assert(Dedup.exactDedup(corpus(), "doc_id", "text").count() == 4)
  }

  test("dedupReport counts cross-group duplication against the copying " +
      "group (global keeper choice)") {
    import spark.implicits._
    val df = Seq(
      (1L, "same text", "a"),
      (2L, "same text", "b"),   // duplicates a's keeper
      (3L, "same text", "b"),
      (4L, "unique b", "b"),
      (5L, "unique a2", "a"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.dedupReport(df, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dupes")))).toMap
    assert(out("a") == ((2L, 2L, 0L)))
    assert(out("b") == ((3L, 1L, 2L)))
  }

  test("minhash LSH finds exact and near duplicates, skips unrelated") {
    val pairs = Dedup.minhashNearDups(corpus(), "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))   // jaccard 1.0
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("an explicit broadcastSets override yields identical pair sets " +
      "under both autoBroadcastJoinThreshold extremes (the perf knob " +
      "must not change results)") {
    def run(pin: Option[Boolean]): Set[(Long, Long)] =
      Dedup.minhashNearDups(corpus(), "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5,
        broadcastSets = pin)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val pinnedOff = run(Some(false))
      val pinnedOn = run(Some(true))
      spark.conf.set(key, (512L * 1024 * 1024).toString)
      assert(run(Some(false)) == pinnedOff)
      assert(run(Some(true)) == pinnedOn)
      assert(pinnedOff.nonEmpty && pinnedOn.nonEmpty)
    } finally spark.conf.set(key, orig)
  }

  test("exact-dup pair has jaccard exactly 1.0") {
    val row = Dedup.minhashNearDups(corpus(), "doc_id", "text")
      .filter(col("id_a") === 1L && col("id_b") === 2L).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: identical docs same signature; near dups within hamming 8") {
    val sigs = corpus().select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("s")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 8)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 8)
  }

  test("simhash near-dup pairs finds the clone pair") {
    val pairs = Dedup.simhashNearDups(corpus(), "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("embedding near-dups: identical vectors cosine 1, orthogonal skipped") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f, 0.5f)),
      (2L, Array(1.0f, 0.0f, 2.0f, 0.5f)),
      (3L, Array(0.0f, 3.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", threshold = 0.95)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("id_a") == 1L)
    assert(pairs(0).getAs[Long]("id_b") == 2L)
    assert(math.abs(pairs(0).getAs[Double]("cosine") - 1.0) < 1e-12)
  }

  /** Synthetic corpus with a SPREAD of jaccard values around the 0.7
    * threshold (sliding token-window overlap) — the case LSH can miss and
    * the exact prefix join must not.
    */
  private def overlapCorpus() = {
    import spark.implicits._
    val vocab = (0 until 80).map(i => s"w$i")
    // doc i = 20 tokens starting at 2*i: consecutive docs share 18/22
    // distinct trigrams-ish => jaccard ~0.64-0.82 band around 0.7
    val docs = (0 until 25).map { i =>
      (i.toLong, vocab.slice(2 * i, 2 * i + 20).mkString(" "))
    }
    (docs :+ (100L, docs(3)._2)).toDF("doc_id", "text") // plus an exact clone
  }

  private def brute64(df: org.apache.spark.sql.DataFrame, t: Double) = {
    val sets = df.select(col("doc_id"),
      array_distinct(transform(Dedup.wordShingles(col("text"), 3), s => xxhash64(s)))
        .as("shset"))
    val a = sets.select(col("doc_id").as("id_a"), col("shset").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("shset").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("union_",
        (size(col("sa")) + size(col("sb"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("union_").cast("double"))
      .filter(col("jaccard") >= t)
      .select("id_a", "id_b", "jaccard")
  }

  test("prefix-filtered jaccard join EXACTLY matches brute force (incl. near-threshold pairs)") {
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val exact = Dedup.prefixJaccardPairs(overlapCorpus(), "doc_id", "text", 3, t)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          math.rint(r.getAs[Double]("jaccard") * 1e9))).toSet
      val brute = brute64(overlapCorpus(), t)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          math.rint(r.getAs[Double]("jaccard") * 1e9))).toSet
      assert(exact == brute, s"threshold $t: prefix join != brute force")
      assert(brute.nonEmpty, s"threshold $t: degenerate test corpus")
    }
    CacheRegistry.drain()
  }

  test("nearDupClusters (exact-collapse-first) EXACTLY matches clustering " +
      "over full-corpus pair generation, including rep-less exact cliques") {
    // overlapCorpus + clones of docs with AND without near-dup neighbors:
    // doc 3 has neighbors (its clone joins that component); doc 200/201
    // clone an isolated text (an exact clique whose rep has no pairs — the
    // coalesce branch); singletons must not appear at all.
    import spark.implicits._
    val extra = Seq(
      (200L, "isolated exact clique text zz yy xx ww vv uu tt ss rr qq"),
      (201L, "isolated exact clique text zz yy xx ww vv uu tt ss rr qq"))
      .toDF("doc_id", "text")
    val df = overlapCorpus().unionAll(extra)
    val viaCollapse = Dedup.nearDupClusters(df, "doc_id", "text", 3, 0.7)
      .collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("max_id"))).toSet
    val pairs = Dedup.prefixJaccardPairs(df, "doc_id", "text", 3, 0.7)
    val naive = Components.dupClusters(pairs, "id_a", "id_b")
      .collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("max_id"))).toSet
    assert(viaCollapse == naive,
      s"collapse-first clusters differ:\n  collapse=$viaCollapse\n  naive=$naive")
    // the isolated exact clique is present exactly once, labeled min-id
    assert(viaCollapse.exists { case (cid, n, mx) =>
      cid == 200L && n == 2L && mx == 201L })
    CacheRegistry.drain()
  }

  test("brute-force tiers refuse oversized input (guarded crossJoin)") {
    import spark.implicits._
    val big = spark.range(Dedup.BruteForceMaxRows + 1)
      .select(col("id").as("doc_id"), concat(lit("text w"), col("id")).as("text"))
    val eJ = intercept[IllegalArgumentException] {
      Dedup.bruteForceJaccardPairs(big, "doc_id", "text", 3, 0.7)
    }
    assert(eJ.getMessage.contains("prefixJaccardPairs"))
    val bigVec = spark.range(Dedup.BruteForceMaxRows + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val eC = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(bigVec, "vec_id", "embedding",
        threshold = 0.9, planes = 0, dim = 2)
    }
    assert(eC.getMessage.contains("gridNearDups"))
    // under the cap the brute tier still works
    val small = corpus()
    val pairs = Dedup.bruteForceJaccardPairs(small, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("grid-blocked cosine join EXACTLY matches brute force") {
    import spark.implicits._
    val vecs = ((0 until 64).map { i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    } :+ (999L, Array.tabulate(16)(j => ((5 * 31 + j * 7) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    for (t <- Seq(0.8, 0.95, 0.999); dims <- Seq(1, 2, 3)) {
      val grid = Dedup.gridNearDups(vecs, "vec_id", "embedding", t, dims)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          math.rint(r.getAs[Double]("cosine") * 1e9))).toSet
      val brute = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", t, planes = 0)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          math.rint(r.getAs[Double]("cosine") * 1e9))).toSet
      assert(grid == brute, s"threshold $t dims $dims: grid join != brute force")
    }
  }

  test("prefix join == brute force on seeded RANDOM corpora (not just the " +
      "structured overlap shape)") {
    import spark.implicits._
    for (seed <- Seq(7, 41)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"v$i")
      // random doc lengths 1..30 (exercises the <n-token branch), random
      // tokens with heavy reuse so shared shingles are common
      val docs = (0 until 40).map { i =>
        val len = 1 + rnd.nextInt(30)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val exact = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.6)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          math.rint(r.getAs[Double]("jaccard") * 1e9))).toSet
      val brute = brute64(docs, 0.6)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          math.rint(r.getAs[Double]("jaccard") * 1e9))).toSet
      assert(exact == brute, s"seed $seed")
      CacheRegistry.drain()
    }
  }

  test("bloom dedup == plain anti-join on seeded RANDOM corpora " +
      "(random dup rates, random batch/corpus splits)") {
    import spark.implicits._
    for (seed <- Seq(11, 83)) {
      val rnd = new scala.util.Random(seed)
      // texts drawn from a small pool so duplication is heavy and random
      val pool = (0 until 25).map(i => s"pooled document body number $i")
      val rows = (0 until 120).map(i => (i.toLong, pool(rnd.nextInt(pool.size))))
      val (c, b) = rows.partition(_ => rnd.nextBoolean())
      val corp = c.toDF("doc_id", "text")
      val batch = b.toDF("doc_id", "text")
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "fp").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
      val plain = key(Dedup.incrementalDedup(batch, corp, "doc_id", "text"))
      val bloom =
        key(Dedup.bloomIncrementalDedup(batch, corp, "doc_id", "text", 0.3))
      assert(bloom == plain, s"seed $seed")
    }
  }

  test("containment join finds asymmetric subset pairs Jaccard misses, " +
      "and the maxDf stop-shingle cap is a recall knob, never a " +
      "false-positive source") {
    import spark.implicits._
    val big = (0 until 30).map(i => s"tok$i").mkString(" ")
    val prefix = (0 until 8).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, big), (2L, prefix),
      (3L, "entirely different content with no shared phrasing at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 2's six shingles are all in 1 -> containment(2 in 1) = 1.0;
    // the reverse direction is 6/28 and must NOT appear; nor doc 3
    assert(pairs.toSeq == Seq((2L, 1L, 1.0)), pairs.toSeq.toString)
    // symmetric jaccard on the same pair: 6/28 -- far under any
    // near-dup threshold, which is exactly why this operator exists
    val jac = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect()
    assert(jac.isEmpty)
    // capping df at 1 removes the shared shingles from the index ->
    // the pair disappears (recall-only effect)
    val capped = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8,
      maxDf = 1L).collect()
    assert(capped.isEmpty)
    CacheRegistry.drain()
  }

  test("containment join == brute-force set containment on seeded RANDOM " +
      "corpora (incl. sub-n-token docs via the whole-text fallback)") {
    import spark.implicits._
    for (seed <- Seq(5, 29)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 30).map(i => s"w$i")
      val docs = (0 until 35).map { i =>
        val len = 1 + rnd.nextInt(25) // 1..25 tokens: some below n=3
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // brute force: distinct shingle sets in plain Scala
      def shingles(text: String): Set[String] = {
        val ts = text.split(" ").filter(_.nonEmpty).toSeq
        if (ts.size >= 3) ts.sliding(3).map(_.mkString(" ")).toSet
        else Set(ts.mkString(" "))
      }
      val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
      val expected = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
        inter = (sa & sb).size if inter > 0
        c = inter.toDouble / sa.size if c >= 0.6
      } yield (a, b, math.rint(c * 1e6) / 1e6)).toSet
      val got = Dedup.containmentPairs(
          docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.6)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"seed $seed")
      CacheRegistry.drain()
    }
  }

  test("md5Hash60 matches the DuckDB hex-cast value (cross-engine parity)") {
    import spark.implicits._
    // DuckDB: SELECT CAST(('0x' || substr(md5('hello'),1,15)) AS BIGINT)
    val h = Seq("hello").toDF("t")
      .select(Dedup.md5Hash60(col("t")).as("h")).collect()(0).getAs[Long]("h")
    assert(h == 419982666956583591L)
  }

  test("simhashMd5: clones identical, near-dups close, empty doc is 0") {
    import spark.implicits._
    val withEmpty = corpus().unionAll(Seq((9L, "")).toDF("doc_id", "text"))
    val sigs = Dedup.simhashMd5(withEmpty, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 8)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 8)
    assert(sigs(9L) == 0L)
    assert(sigs.values.forall(s => (s >> 60) == 0L)) // 60-bit domain
  }

  test("simhash chunk-blocked pairs EXACTLY match brute force over signatures") {
    val sigs = Dedup.simhashMd5(overlapCorpus(), "doc_id", "text")
    val all = sigs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    // production config (3, 15-bit x 4) and a wide config (10, 5-bit x 12)
    // — both satisfy the pigeonhole bound over the 60-bit domain
    for ((maxH, cb, nc) <- Seq((3, 15, 4), (10, 5, 12))) {
      val blocked = Dedup.simhashPairsFromSigs(
          sigs, "doc_id", "simhash", maxH, cb, nc)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("hamming"))).toSet
      val brute = (for {
        (ia, sa) <- all; (ib, sb) <- all
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
      assert(blocked == brute, s"config ($maxH,$cb,$nc)")
      assert(brute.nonEmpty, s"config ($maxH,$cb,$nc): no pairs in corpus")
    }
  }

  test("pigeonholeBucketStats surfaces the hot bucket of a low-entropy " +
      "population; maxBucket cap drops it LOUDLY and spares healthy buckets") {
    import spark.implicits._
    // degenerate low-entropy fixture: 50 signatures differing only in
    // the low 6 bits — chunks 1..3 (bits 16+) are ALL-ZERO for every
    // signature, so each is one 50-member hot bucket, while chunk 0
    // holds 50 distinct singleton values. The near-solid-image shape
    // the observability exists for.
    val sigs = (0L until 50L).map(i => (i, i)).toDF("id", "sig")
    val stats = Dedup.pigeonholeBucketStats(sigs, "id", "sig", 16, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats == Set((1, 0L, 50L), (2, 0L, 50L), (3, 0L, 50L)),
      s"hot buckets must surface (singletons pruned): $stats")
    // uncapped: perfect recall — every Hamming<=3 pair
    val unc = Dedup.simhashPairsFromSigs(sigs, "id", "sig", 3, 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      a <- 0L until 50L; b <- 0L until 50L
      if a < b && java.lang.Long.bitCount(a ^ b) <= 3
    } yield (a, b)).toSet
    assert(unc == brute && brute.nonEmpty)
    // capped below the hot-bucket size: all three hot buckets drop
    // (logged), chunk 0's singletons yield no candidates — 0 pairs,
    // the documented recall trade of the cap
    val capped = Dedup.simhashPairsFromSigs(sigs, "id", "sig", 3, 16, 4,
      maxBucket = 10)
    assert(capped.count() == 0L)
    // a healthy (high-entropy) population under a generous cap is
    // byte-identical to uncapped — the cap only ever bites hot buckets
    val healthy = Dedup.simhashMd5(overlapCorpus(), "doc_id", "text")
    val a1 = Dedup.simhashPairsFromSigs(healthy, "doc_id", "simhash",
        3, 15, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a2 = Dedup.simhashPairsFromSigs(healthy, "doc_id", "simhash",
        3, 15, 4, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a1 == a2 && a1.nonEmpty)
  }

  test("grid cosine join == brute force on seeded RANDOM unit vectors " +
      "(boundary-uniform directions, thresholds spanning weak to near-dup)") {
    import spark.implicits._
    for (seed <- Seq(3, 99)) {
      val rnd = new scala.util.Random(seed)
      // random gaussian vectors + a few planted near-identical pairs
      val base = (0 until 60).map { i =>
        (i.toLong, Array.fill(12)(rnd.nextGaussian().toFloat))
      }
      val nearDups = (0 until 5).map { j =>
        val (_, v) = base(j * 7)
        val w = v.clone(); w(0) = w(0) + 0.01f
        ((1000 + j).toLong, w)
      }
      val vecs = (base ++ nearDups).toDF("vec_id", "embedding")
      for (t <- Seq(0.7, 0.9, 0.995); dims <- Seq(2, 4)) {
        val grid = Dedup.gridNearDups(vecs, "vec_id", "embedding", t, dims)
          .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
            math.rint(r.getAs[Double]("cosine") * 1e9))).toSet
        val brute = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", t, planes = 0)
          .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
            math.rint(r.getAs[Double]("cosine") * 1e9))).toSet
        assert(grid == brute, s"seed $seed threshold $t dims $dims")
      }
    }
  }

  test("incrementalJaccardDedup: corpus near-dups, lower-id batch " +
      "near-dups, and chained twins all suppress; distinct docs survive") {
    import spark.implicits._
    def words(tag: String) =
      (1 to 12).map(k => s"$tag token$k").mkString(" ")
    val corp = Seq(
      (2L, words("alpha")),
      (4L, words("beta"))).toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of corpus doc 2 (drop last word) → suppressed
      (11L, words("alpha").split(" ").dropRight(1).mkString(" ")),
      // novel original…
      (13L, words("gamma")),
      // …whose near-twin has the higher id → only the twin drops
      (15L, words("gamma").split(" ").dropRight(1).mkString(" ")),
      // chain: 17 (20/24 tokens of corpus doc 4, J = 18/22 ≈ 0.82)
      // → suppressed by the corpus; 19 (16/24 tokens, J vs corpus =
      // 14/22 ≈ 0.64 < 0.7 but J vs 17 = 14/18 ≈ 0.78) → ALSO
      // suppressed even though its ONLY ≥ 0.7 partner is the lower-id
      // batch doc that was itself suppressed (suppression-biased
      // one-pass rule, not sequential-greedy)
      (17L, words("beta").split(" ").dropRight(4).mkString(" ")),
      (19L, words("beta").split(" ").dropRight(8).mkString(" ")),
      // unrelated novel doc
      (21L, words("delta"))).toDF("doc_id", "text")
    val novel = Dedup.incrementalJaccardDedup(
        batch, corp, "doc_id", "text", shingleN = 3, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(13L, 21L))
    // pinning both formulations (the prefixJaccardPairs contract):
    // explicit broadcast and shuffle paths agree
    for (b <- Seq(Some(true), Some(false))) {
      val got = Dedup.incrementalJaccardDedup(
          batch, corp, "doc_id", "text", 3, 0.7, broadcastSets = b)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == novel, s"broadcastSets=$b diverged")
    }
    CacheRegistry.drain()
  }

  test("editDistancePairs EXACTLY matches brute-force Levenshtein on " +
      "seeded random strings with planted insert/delete/substitute " +
      "edits at and beyond the radius") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def randStr(n: Int): String =
      (1 to n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val base = (1L to 40L).map(i => i -> randStr(20 + rnd.nextInt(15)))
    val planted = base.collect {
      case (i, s) if i % 4 == 0 =>
        (i + 100L, s + "xq") // 2 insertions
      case (i, s) if i % 5 == 0 =>
        (i + 200L, s.drop(3)) // 3 deletions — at the radius
      case (i, s) if i % 7 == 0 =>
        (i + 300L, s.take(4) + "ZZZZ" + s.drop(8)) // 4 subs — beyond
    }
    // tiny-string tier: shorter than k+1 the pigeonhole cannot anchor
    // ("ab" vs "xy" share nothing yet ed=2) — including the empty
    // string (ed("", x) = |x|)
    val tiny = Seq(401L -> "", 402L -> "ab", 403L -> "xy",
      404L -> "abcd", 405L -> "", 406L -> "abq")
    val all = base ++ planted ++ tiny
    val df = all.toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s", maxEdits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      e = lev(sa, sb) if e <= 3
    } yield (ia, ib, e.toLong)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // the radius-boundary plants are found, the beyond-radius are not
    assert(want.exists { case (a, b, e) => b == a + 200L && e == 3L })
    assert(!got.exists { case (a, b, _) => b == a + 300L })
    CacheRegistry.drain()
  }

  test("prefixJaccardPairs with probeIds equals the unrestricted pair " +
      "relation filtered to probe-touching pairs — same jaccard values, " +
      "no probe-free pair ever emitted") {
    import spark.implicits._
    def words(tag: String) = (1 to 15).map(k => s"$tag word$k").mkString(" ")
    // clone families so near-dup pairs exist within AND across the
    // probe/non-probe split
    val df = (1L to 40L).map { i =>
      val fam = i % 5
      (i, words(s"fam$fam").split(" ").dropRight((i % 3).toInt)
        .mkString(" "))
    }.toDF("doc_id", "text")
    val probe = df.filter($"doc_id" % 4 === 0).select("doc_id")
    val probeSet = probe.collect().map(_.getLong(0)).toSet
    def collectPairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val full = collectPairs(Dedup.prefixJaccardPairs(
      df, "doc_id", "text", shingleN = 3, threshold = 0.6))
    val probed = collectPairs(Dedup.prefixJaccardPairs(
      df, "doc_id", "text", shingleN = 3, threshold = 0.6,
      probeIds = Some(probe)))
    val want = full.filter { case (a, b, _) =>
      probeSet(a) || probeSet(b) }
    assert(probed == want,
      s"missing=${(want -- probed).take(5)} extra=${(probed -- want).take(5)}")
    // the fixture really exercises both sides of the restriction
    assert(want.nonEmpty && (full -- want).nonEmpty)
    CacheRegistry.drain()
  }

  test("editDistancePairs on a degenerate duplicate-heavy population " +
      "(identical-string cliques of empty/1-char titles) stays EXACT and " +
      "bounded: cliques collapse to representatives before both tiers") {
    import spark.implicits._
    // dirty-corpus shape: mass-duplicated empty and 1-char titles (the
    // population that used to concentrate quadratic candidate mass in
    // the tiny tier's cross join), plus duplicated real titles whose
    // cross-group distance exercises the member expansion
    val dirty =
      (1L to 150L).map(i => i -> "") ++
      (201L to 300L).map(i => i -> "a") ++
      (401L to 405L).map(i => i -> "hello world title") ++
      (501L to 504L).map(i => i -> "hello world titles") ++
      Seq(601L -> "completely different heading")
    val df = dirty.toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s", maxEdits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- dirty; (ib, sb) <- dirty if ia < ib
      e = lev(sa, sb) if e <= 3
    } yield (ia, ib, e.toLong)).toSet
    assert(got.size == want.size && got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // the planted cross-group relation survived the collapse/expand
    assert(got.contains((401L, 501L, 1L)))
    assert(got.contains((1L, 201L, 1L))) // ed("", "a") = 1
    CacheRegistry.drain()
  }

  test("editDistancePairs REFUSES an adversarial distinct-short-string " +
      "population instead of running an unguarded quadratic join") {
    import spark.implicits._
    // > BruteForceMaxRows DISTINCT strings of length <= 2k: the brute
    // tier's honest worst case — collapse cannot shrink it, so the
    // guard must fire loudly
    val n = (Dedup.BruteForceMaxRows + 1L).toInt
    val df = spark.range(1, n + 1)
      .selectExpr("id", "cast(id as string) as s")
    val ex = intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, "id", "s", maxEdits = 4).count()
    }
    assert(ex.getMessage.contains("tiny-string tier"))
    CacheRegistry.drain()
  }

  test("incrementalLshDedup: indexed near-dups suppress, own-id keys " +
      "never do (replay idempotence), min-id wins within a batch") {
    import spark.implicits._
    def doc(tag: String, n: Int) =
      (1 to n).map(k => s"$tag word$k").mkString(" ")
    val seed = Seq((1L, doc("alpha", 12)), (2L, doc("beta", 12)))
      .toDF("doc_id", "text")
    val emptyIdx = Seq.empty[(Long, Int, Long)]
      .toDF("doc_id", "band_id", "band_hash")
    // everything is novel against an empty index
    val n0 = Dedup.incrementalLshDedup(
        seed, emptyIdx, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(n0 == Set(1L, 2L))
    val idx = Dedup.lshBandKeys(seed, "doc_id", "text")
    // batch: a near-dup of indexed doc 1 (last word dropped), a novel
    // doc, and a higher-id near-copy of that novel doc
    val batch = Seq(
      (11L, doc("alpha", 12).split(" ").dropRight(1).mkString(" ")),
      (13L, doc("gamma", 12)),
      (15L, doc("gamma", 12).split(" ").dropRight(1).mkString(" ")))
      .toDF("doc_id", "text")
    val novel = Dedup.incrementalLshDedup(
        batch, idx, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(13L), s"got $novel")
    // replay: after appending the admitted doc's keys, re-running the
    // SAME batch admits the same set — its own keys never suppress it
    val idx2 = idx.unionByName(Dedup.lshBandKeys(
      batch.filter($"doc_id" === 13L), "doc_id", "text"))
    val replay = Dedup.incrementalLshDedup(
        batch, idx2, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replay == Set(13L), s"replay diverged: $replay")
    CacheRegistry.drain()
  }

  test("bloom-prefiltered incremental dedup EXACTLY matches the plain " +
      "anti-join at every fpp (no false negatives ⇒ sketch never changes " +
      "the answer)") {
    import spark.implicits._
    val all = (1L to 60L).map { i =>
      (i, if (i % 7 == 0) s"shared text block ${i % 3}"
          else s"unique document number $i body")
    }.toDF("doc_id", "text")
    val corp = all.filter($"doc_id" % 2 === 0)
    val batch = all.filter($"doc_id" % 2 =!= 0)
      .unionAll(corp.select(($"doc_id" + 100L).as("doc_id"), $"text"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = key(Dedup.incrementalDedup(batch, corp, "doc_id", "text"))
    // exact clones of corpus content must all be excluded
    assert(plain.nonEmpty && plain.forall { case (id, _) => id <= 100 })
    // a high fpp floods the confirm join, a low one starves it — the
    // answer must be identical either way
    for (fpp <- Seq(0.5, 0.01)) {
      val bloom =
        key(Dedup.bloomIncrementalDedup(batch, corp, "doc_id", "text", fpp))
      assert(bloom == plain, s"fpp=$fpp diverged from the exact anti-join")
    }
    // the production path: a caller-provided index cardinality skips the
    // sizing count() — exact at the true count, at a 100x overestimate,
    // and even at a pessimal low-ball (a wrong size only shifts work
    // into the confirm join, never the answer)
    for (cnt <- Seq(30L, 3000L, 1L)) {
      val sized = key(Dedup.bloomIncrementalDedup(
        batch, corp, "doc_id", "text", 0.01, corpusCount = Some(cnt)))
      assert(sized == plain, s"corpusCount=$cnt diverged")
    }
    intercept[IllegalArgumentException] {
      Dedup.bloomIncrementalDedup(
        batch, corp, "doc_id", "text", 0.01, corpusCount = Some(0L))
    }
  }

  test("repeatedSpans: a passage shared across docs is cut everywhere " +
      "EXCEPT its globally-first occurrence; spans merge maximally; " +
      "sub-n docs never participate") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter for daily updates and offers now"
    val df = Seq(
      (1L, s"alpha beta gamma delta $boiler"),            // keeper (min doc)
      (2L, s"epsilon zeta eta theta iota $boiler kappa"), // cut
      (3L, s"$boiler"),                                   // cut entirely
      (4L, "unrelated text with no shared passage at all whatsoever here"),
      (5L, "tiny doc"))                                   // < n tokens
      .toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(df, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // keeper doc 1 keeps everything (its occurrence is globally first)
    assert(out(1L) == ((s"alpha beta gamma delta $boiler", 0L, 0L)), out(1L))
    // doc 2 loses exactly the 10-token boilerplate, one merged span
    assert(out(2L) == (("epsilon zeta eta theta iota kappa", 1L, 10L)), out(2L))
    // doc 3 WAS the passage: comes back empty, not dropped
    assert(out(3L) == (("", 1L, 10L)), out(3L))
    assert(out(4L)._2 == 0L && out(5L)._2 == 0L)
    val spans = Dedup.repeatedSpans(df, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((2L, 5, 15), (3L, 0, 10)), spans)
  }

  test("repeatedSpans catches WITHIN-document repetition (second " +
      "occurrence cut, first kept) and leaves a repeat-free corpus " +
      "byte-identical to its token normal form") {
    import spark.implicits._
    val run = "one two three four five six seven eight"
    val df = Seq(
      (1L, s"$run filler padding words between occurrences $run"),
      (2L, "a fully unique document with nothing repeated inside it"))
      .toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(df, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((s"$run filler padding words between occurrences",
      1L, 8L)), out(1L))
    assert(out(2L) == (("a fully unique document with nothing repeated " +
      "inside it", 0L, 0L)), out(2L))
  }

  test("repeatedSpans == an independent brute-force reference on seeded " +
      "RANDOM corpora (small vocab forces organic cross- and within-doc " +
      "window repeats)") {
    import spark.implicits._
    val L = 4
    for (seed <- Seq(13, 57)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 6).map(i => s"w$i") // tiny vocab: 4-grams repeat
      val raw = (0 until 30).map { i =>
        val len = 2 + rnd.nextInt(20) // exercises the <L branch too
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = raw.toDF("doc_id", "text")
      val got = Dedup.repeatedSpans(df, "doc_id", "text", L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      // brute force, written independently of the operator: enumerate
      // every window, pick each window-string's lexicographic-min
      // (doc,pos) keeper, mark the rest, merge per doc
      val wins = for {
        (id, text) <- raw
        ts = text.split(" ").filter(_.nonEmpty)
        p <- 0 to ts.length - L
      } yield (ts.slice(p, p + L).mkString(" "), id, p)
      val marked = wins.groupBy(_._1).values.flatMap { occ =>
        if (occ.size < 2) Nil
        else occ.map(o => (o._2, o._3)).sorted.tail
      }.toSeq
      val expect = marked.groupBy(_._1).flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val spans = scala.collection.mutable.ListBuffer[(Int, Int)]()
        for (p <- sorted) {
          if (spans.nonEmpty && p <= spans.last._2) {
            val (s, _) = spans.remove(spans.length - 1); spans += ((s, p + L))
          } else spans += ((p, p + L))
        }
        spans.map { case (s, e) => (id, s, e) }
      }.toSet
      assert(got == expect, s"seed $seed")
      CacheRegistry.drain()
    }
  }

  test("cache registry: operators track persisted frames, drain releases them") {
    CacheRegistry.drain()
    Dedup.minhashNearDups(corpus(), "doc_id", "text").count()
    assert(CacheRegistry.size >= 1)
    CacheRegistry.drain()
    assert(CacheRegistry.size == 0)
  }

  test("LSH bucketed embedding dedup finds clone pair too") {
    import spark.implicits._
    val vecs = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    } :+ (999L, Array.tabulate(64)(j => ((5 * 31 + j * 7) % 13 - 6).toFloat))
    val df = vecs.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, "vec_id", "embedding",
      threshold = 0.999, planes = 4).collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("id_a") == 5L && r.getAs[Long]("id_b") == 999L))
  }

  test("snapshotDiff: presence decides added/removed, the normalized " +
      "fingerprint decides changed/unchanged (whitespace reflow is " +
      "UNCHANGED), and a present null-text row is never 'added'") {
    val session = spark
    import session.implicits._
    val oldSnap = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "gone soon"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "  alpha   beta "), // reflow only
      (2L, "gamma delta EDITED"),
      (4L, null.asInstanceOf[String]), // still-null: unchanged
      (5L, "brand new")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"), got.toString)
  }

  test("minhashRecallAudit + minhashFidelityAudit match a full scalar " +
      "replay of the portable pipeline (md5-32 hashes, mod-prime " +
      "permutations, band keys, candidates, exact Jaccard)") {
    val session = spark
    import session.implicits._
    val docsSeq = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l"), // exact dup of 1
      (3L, "a b c d e f g h i j k x"), // near dup of 1
      (4L, "a b c d e f zz yy xx ww vv uu"), // mid-jaccard with 1
      (5L, "p q r s t u v w y z")) // unrelated
    val df = docsSeq.toDF("doc_id", "text")

    def md5_32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16)
    def shingleSet(text: String): Set[Long] = {
      val t = text.split(" ").filter(_.nonEmpty).toSeq
      val ss =
        if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq
        else Seq(t.mkString(" "))
      ss.map(md5_32).toSet
    }
    val P = 4294967311L
    val perms = Dedup.permConstants(32)
    def sig(h: Set[Long]): Seq[Long] =
      perms.map { case (a, b) => h.map(x => (x * a + b) % P).min }
    def bandKeys(s: Seq[Long]): Set[(Int, String)] =
      s.grouped(4).zipWithIndex.map { case (g, b) => (b, g.mkString("_")) }
        .toSet
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val sets = docsSeq.map { case (id, t) => id -> shingleSet(t) }.toMap
    val sigs = sets.map { case (id, h) => id -> sig(h) }
    val pairs = for {
      (i, si) <- sets.toSeq; (j, sj) <- sets.toSeq
      if i < j
      inter = (si & sj).size
      jac = inter.toDouble / (si.size + sj.size - inter)
      if jac >= 0.3
    } yield (i, j, jac,
      (bandKeys(sigs(i)) & bandKeys(sigs(j))).nonEmpty,
      sigs(i).zip(sigs(j)).count { case (x, y) => x == y })
    assert(pairs.exists(p => p._3 < 1.0) && pairs.exists(p => p._3 == 1.0),
      s"corpus must plant both exact and partial pairs: $pairs")

    val wantRecall = pairs.groupBy(p =>
        math.min(math.floor(p._3 * 10).toLong, 9L))
      .map { case (b, ps) =>
        (b, ps.size.toLong, ps.count(_._4).toLong,
          r6(ps.count(_._4).toDouble / ps.size.toDouble))
      }.toSet
    val gotRecall = Dedup.minhashRecallAudit(df, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("j_band"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_found"),
        r.getAs[Double]("recall"))).toSet
    assert(gotRecall == wantRecall, s"recall audit:\n$gotRecall\n$wantRecall")

    val wantFid = pairs.map { case (i, j, jac, _, m) =>
      (i, j, r6(jac), m.toLong, r6(m / 32.0),
        r6(math.abs(m / 32.0 - jac)))
    }.toSet
    val gotFid = Dedup.minhashFidelityAudit(df, "doc_id", "text",
        shingleN = 3, numHashes = 32, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("j_exact"), r.getAs[Long]("matches"),
        r.getAs[Double]("j_est"), r.getAs[Double]("abs_err"))).toSet
    assert(gotFid == wantFid, s"fidelity audit:\n$gotFid\n$wantFid")
    // exact duplicates: every signature component matches, every band
    // shared — recall on the jaccard=1 pair is structural, not luck
    val dup = gotFid.find(p => p._1 == 1L && p._2 == 2L).get
    assert(dup._4 == 32L && dup._3 == 1.0 && dup._6 == 0.0, dup.toString)
  }

  test("lshBandSweep: the r19 one-join ladder matches a scalar per-arm " +
      "replay, and a zero-candidate corpus still emits every arm's " +
      "skeleton row") {
    val session = spark
    import session.implicits._
    val docsSeq = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l"), // exact dup of 1
      (3L, "a b c d e f g h i j k x"), // near dup of 1
      (4L, "a b c d e f zz yy xx ww vv uu"), // mid-jaccard with 1
      (5L, "p q r s t u v w y z")) // unrelated
    val df = docsSeq.toDF("doc_id", "text")
    def md5_32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16)
    def shingleSet(text: String): Set[Long] = {
      val t = text.split(" ").filter(_.nonEmpty).toSeq
      val ss =
        if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq
        else Seq(t.mkString(" "))
      ss.map(md5_32).toSet
    }
    val P = 4294967311L
    val perms = Dedup.permConstants(32)
    def sig(h: Set[Long]): Seq[Long] =
      perms.map { case (a, b) => h.map(x => (x * a + b) % P).min }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sets = docsSeq.map { case (id, t) => id -> shingleSet(t) }.toMap
    val sigs = sets.map { case (id, h) => id -> sig(h) }
    def bandKeysAt(s: Seq[Long], bands: Int): Set[(Int, String)] =
      s.grouped(32 / bands).zipWithIndex
        .map { case (g, b) => (b, g.mkString("_")) }.toSet
    val ids = docsSeq.map(_._1)
    val allPairs = for {
      i <- ids; j <- ids if i < j
      si = sets(i); sj = sets(j)
      inter = (si & sj).size
    } yield (i, j, inter.toDouble / (si.size + sj.size - inter))
    val exact = allPairs.filter(_._3 >= 0.5)
    assert(exact.nonEmpty)
    val want = Seq(4, 8, 16, 32).map { bands =>
      def shares(i: Long, j: Long) =
        (bandKeysAt(sigs(i), bands) & bandKeysAt(sigs(j), bands)).nonEmpty
      val nCand = allPairs.count(p => shares(p._1, p._2)).toLong
      val nFound = exact.count(p => shares(p._1, p._2)).toLong
      (bands, 32 / bands, nCand, nFound,
        r6(nFound.toDouble / exact.size.toDouble))
    }
    val got = Dedup.lshBandSweep(df, "doc_id", "text", shingleN = 3,
        numHashes = 32, bandsLadder = Seq(4, 8, 16, 32), threshold = 0.5)
      .collect().map(r => (r.getAs[Int]("bands"),
        r.getAs[Int]("rows_per_band"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_found"), r.getAs[Double]("recall"))).toSeq
    assert(got == want, s"band sweep:\n$got\n$want")
    // zero-candidate ARM: one mid-Jaccard pair (J = 4/12 ≈ 0.33) whose
    // 8-consecutive-component band match is combinatorially absent at
    // bands=4 — the ladder skeleton LEFT join must still emit that
    // arm's row with zeros (the per-arm aggregation of the old
    // formulation always did). Verified against the same scalar replay
    // rather than assumed.
    val midSeq = Seq((1L, "a b c d e f g h i j"),
      (2L, "a b c d e f q r s t"))
    val midSets = midSeq.map { case (id, t) => id -> shingleSet(t) }.toMap
    val midSigs = midSets.map { case (id, h) => id -> sig(h) }
    val wantMid = Seq(4, 8, 16, 32).map { bands =>
      val share = (bandKeysAt(midSigs(1L), bands) &
        bandKeysAt(midSigs(2L), bands)).nonEmpty
      (bands, if (share) 1L else 0L)
    }
    assert(wantMid.exists(_._2 == 0L),
      s"fixture must leave at least one arm candidate-free: $wantMid")
    val z = Dedup.lshBandSweep(midSeq.toDF("doc_id", "text"), "doc_id",
        "text", shingleN = 3, numHashes = 32,
        bandsLadder = Seq(4, 8, 16, 32), threshold = 0.3)
      .collect().map(r => (r.getAs[Int]("bands"),
        r.getAs[Long]("n_candidates"))).toSeq
    assert(z == wantMid, s"skeleton arms:\n$z\n$wantMid")
  }

  test("MinhashSigAgg: the elementwise-min aggregator equals a driver " +
      "replay of the k min-aggregates value for value, and its merge " +
      "path (partials across many partitions) changes nothing") {
    val session = spark
    import session.implicits._
    val P = 4294967311L
    val perms = Dedup.permConstants(8)
    val rows = (1L to 5L).flatMap(id =>
      (0L until 40L).map(k => (id, (id * 7919L + k * 104729L) % 4294967296L)))
    val want = rows.groupBy(_._1).map { case (id, hs) =>
      id -> perms.map { case (a, b) => hs.map(_._2).map(h =>
        (h * a + b) % P).min }.toVector
    }
    def got(df: org.apache.spark.sql.DataFrame): Map[Long, Vector[Long]] =
      df.groupBy(col("id"))
        .agg(Dedup.minhashSigAgg(col("h"), 8).as("sig"))
        .collect()
        .map(r => r.getAs[Long]("id") ->
          r.getAs[scala.collection.Seq[Long]]("sig").toVector)
        .toMap
    val one = got(rows.toDF("id", "h").coalesce(1))
    assert(one == want, s"single-partition: $one\nvs $want")
    // 16 partitions force per-partition partial buffers and the merge
    // fold at the exchange — result must be identical
    assert(got(rows.toDF("id", "h").repartition(16)) == one,
      "merge across partitions must not change the signature")
    CacheRegistry.drain()
  }

  test("hyperplaneRecallAudit matches a scalar replay of buckets, " +
      "cosines, and per-band recall; exact clones always share the " +
      "bucket") {
    val session = spark
    import session.implicits._
    val dim = 8
    // deterministic small vector set with clones and partial rotations
    val vecs: Seq[(Long, Array[Double])] = (0 until 12).map { i =>
      val v = Array.tabulate(dim)(d =>
        math.sin(i * 1.7 + d * 0.9) + (if (d == i % dim) 1.5 else 0.0))
      (i.toLong, v)
    } ++ (0 until 12).map { i =>
      val t = (i % 4) / 4.0
      val b = Array.tabulate(dim)(d =>
        math.sin(i * 1.7 + d * 0.9) + (if (d == i % dim) 1.5 else 0.0))
      val n = math.sqrt(b.map(x => x * x).sum)
      ((i + 100).toLong,
        b.zipWithIndex.map { case (x, d) =>
          (1.0 - t) * x + t * n * (if (d % 2 == 0) 1.0 else -1.0) / 4.0
        })
    }
    val df = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")

    val planes = (0 until 4).map(p =>
      Dedup.planeVectorValues(p, dim).toArray)
    def bucket(v: Array[Double]): Long =
      (0 until 4).map { p =>
        val dot = v.zip(planes(p)).foldLeft(0.0) { case (a, (x, w)) =>
          a + x * w
        }
        if (dot >= 0) 1L << p else 0L
      }.reduce(_ | _)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def fold(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      val (na, nb) = (math.sqrt(fold(a, a)), math.sqrt(fold(b, b)))
      if (na > 0 && nb > 0) fold(a, b) / (na * nb) else 0.0
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pairs = for {
      (i, vi) <- vecs; (j, vj) <- vecs
      if i < j
      c = cos(vi, vj)
      if c >= 0.4
    } yield (math.min(math.floor(c * 10).toLong, 9L),
      bucket(vi) == bucket(vj))
    val want = pairs.groupBy(_._1).map { case (b, ps) =>
      (b, ps.size.toLong, ps.count(_._2).toLong,
        r6(ps.count(_._2).toDouble / ps.size.toDouble))
    }.toSet
    val got = Dedup.hyperplaneRecallAudit(df, "id", "vec",
        threshold = 0.4, planes = 4, dim = dim)
      .collect().map(r => (r.getAs[Long]("c_band"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_found"),
        r.getAs[Double]("recall"))).toSet
    assert(got == want, s"hyperplane audit:\n$got\n$want")
    // the t=0 variants are exact clones: found structurally
    val cloneBands = pairs.nonEmpty && (0 until 12).filter(_ % 4 == 0)
      .forall { i =>
        bucket(vecs(i)._2) == bucket(vecs.find(_._1 == i + 100L).get._2)
      }
    assert(cloneBands, "exact clones must share every sign bucket")
  }

  test("qualityCollapse keeps the max-quality member (ties -> min id), " +
      "emits nothing for singletons, and nearDupMembers labels every " +
      "cluster member") {
    import spark.implicits._
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val df = Seq(
      (1L, toks("a", 20)),  // full — keeps over its truncated copy
      (2L, toks("a", 18)),  // jaccard 16/18 vs doc 1
      (10L, toks("b", 18)), // truncated — the HIGHER id must win here
      (11L, toks("b", 20)),
      (20L, toks("c", 20)), // exact pair: tie on quality -> min id
      (21L, toks("c", 20)),
      (30L, toks("z", 20))) // singleton: no output row
      .toDF("doc_id", "text")
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))).cast("long"))
    val out = Dedup.qualityCollapse(df, "doc_id", "text", "n_tokens", 3, 0.7)
      .collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("keep_id"), r.getAs[Long]("keep_quality"))).toSet
    assert(out == Set((1L, 2L, 1L, 20L), (10L, 2L, 11L, 20L),
      (20L, 2L, 20L, 20L)), s"collapse mismatch: $out")
    val mem = Dedup.nearDupMembers(df, "doc_id", "text", 3, 0.7)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toSet
    assert(mem == Set((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)), s"membership mismatch: $mem")
    CacheRegistry.drain()
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def refCdc(text: String, div: Int): Seq[(Long, String, Long)] = {
    val toks = text.split(" ").filter(_.nonEmpty).toSeq
    if (toks.isEmpty) Seq.empty
    else {
      val flags = toks.indices.map { i =>
        i > 0 &&
          java.lang.Long.parseLong(
            md5hex(toks(i - 1) + " " + toks(i)).take(12), 16) % div == 0
      }
      val idx = flags.scanLeft(0L)((a, b) => a + (if (b) 1 else 0)).tail
      toks.zip(idx).groupBy(_._2).toSeq.map { case (ci, ts) =>
        (ci, md5hex(ts.map(_._1).mkString(" ")), ts.size.toLong)
      }
    }
  }

  test("cdcChunks EXACTLY matches a sequential reference chunker " +
      "(boundary rule, fingerprints, token counts; empty/1-token docs)") {
    import spark.implicits._
    val texts = Seq(
      (1L, (1 to 60).map(i => s"tok$i").mkString(" ")),
      (2L, "solo"),
      (3L, ""),
      (4L, ("ph a b c " * 10).trim), // repeated phrase: duplicate fps in ONE doc
      (5L, (1 to 25).map(i => s"w${i % 7}").mkString(" ")))
    val out = Dedup.cdcChunks(texts.toDF("doc_id", "text"),
      "doc_id", "text", divisor = 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_fp"), r.getAs[Long]("n_tokens")))
      .toSet
    val ref = texts.flatMap { case (id, t) =>
      refCdc(t, 4).map { case (ci, fp, n) => (id, ci, fp, n) }
    }.toSet
    assert(out == ref, s"cdc mismatch:\n  spark=$out\n  ref=$ref")
    assert(ref.count(_._1 == 1L) > 1, "divisor-4 60-token doc must split")
  }

  test("cdcChunks equals the sequential reference on SEEDED RANDOM " +
      "corpora across divisors (repeated tokens, tiny vocab, ragged " +
      "lengths)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("a", "bb", "ccc", "w1", "w2", "z")
    val texts = (1L to 40L).map { id =>
      val n = rnd.nextInt(50) // 0..49 tokens, empties included
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = texts.toDF("doc_id", "text")
    for (div <- Seq(2, 4, 8)) {
      val out = Dedup.cdcChunks(df, "doc_id", "text", div)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
          r.getAs[String]("chunk_fp"), r.getAs[Long]("n_tokens"))).toSet
      val ref = texts.flatMap { case (id, t) =>
        refCdc(t, div).map { case (ci, fp, n) => (id, ci, fp, n) }
      }.toSet
      assert(out == ref, s"divisor $div: random-corpus mismatch " +
        s"(out ${out.size} vs ref ${ref.size})")
    }
    CacheRegistry.drain()
  }

  test("CDC chunk identity survives a head insertion: every chunk of " +
      "the original except its first is also a chunk of the shifted doc") {
    val orig = (1 to 80).map(i => s"t$i").mkString(" ")
    val origChunks = refCdc(orig, 4).sortBy(_._1)
    val shifted = refCdc("XX " + orig, 4).sortBy(_._1)
    assert(origChunks.size > 3, "test doc must produce several chunks")
    val origTail = origChunks.tail.map(c => (c._2, c._3))
    val shiftedFps = shifted.map(c => (c._2, c._3)).toSet
    assert(origTail.forall(shiftedFps.contains),
      "downstream chunks must keep their identity under the shift")
  }

  test("q191 threshold sweep invariants: pairs/docs non-increasing and " +
      "mean jaccard non-decreasing in the threshold; the ladder binds") {
    val rows = graft.SparkEntry.queries("q191_neardup_threshold_sweep")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"), r.getAs[Double]("mean_jaccard")))
      .sortBy(_._1)
    assert(rows.length == 7)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._3 >= b._3 },
      s"pairs/docs must not increase with the threshold: ${rows.toSeq}")
    assert(rows.filter(_._2 > 0).sliding(2).forall {
      case Array(a, b) => a._4 <= b._4
      case _ => true
    }, s"mean jaccard must not decrease: ${rows.toSeq}")
    assert(rows.head._2 > rows.last._2 && rows.last._2 > 0,
      s"the planted corpus must make the ladder bind: ${rows.toSeq}")
    CacheRegistry.drain()
  }

  test("cdcDivisorSweep matches a per-divisor cdcChunks replay exactly " +
      "and chunk counts fall as the divisor grows") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 80).map(i => s"t$i").mkString(" ")),
      (2L, "XX " + (1 to 80).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sweep = Dedup.cdcDivisorSweep(df, "doc_id", "text",
        divisors = Seq(4, 8, 16))
      .collect()
      .map(r => r.getAs[Int]("divisor") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("dup_token_mass")))).toMap
    for (d <- Seq(4, 8, 16)) {
      val perFp = Dedup.cdcChunks(df, "doc_id", "text", d)
        .groupBy("chunk_fp")
        .agg(count(lit(1)).as("occ"), max(col("n_tokens")).as("nt"))
        .collect()
        .map(r => (r.getAs[Long]("occ"), r.getAs[Long]("nt")))
      val want = (perFp.map(_._1).sum, perFp.size.toLong,
        perFp.map { case (o, n) => (o - 1) * n }.sum)
      assert(sweep(d) == want, s"divisor $d: ${sweep(d)} vs $want")
    }
    assert(sweep(4)._1 >= sweep(8)._1 && sweep(8)._1 >= sweep(16)._1,
      s"chunk count must fall with the divisor: $sweep")
    assert(sweep(4)._3 > 0, "the prepended clone must create dup mass")
    CacheRegistry.drain()
  }

  test("q195 band sweep invariants: candidate sets nest (wider bands " +
      "imply their sub-bands), so candidates and recall are " +
      "non-decreasing in the band count; the trade genuinely binds") {
    val rows = graft.SparkEntry.queries("q195_lsh_band_sweep")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_found"), r.getAs[Double]("recall")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(4, 8, 16, 32))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._4 <= b._4 },
      s"candidates/recall must not fall as bands grow: ${rows.toSeq}")
    assert(rows.forall(r => r._3 <= r._2 && r._4 <= 1.0))
    assert(rows.head._4 < rows.last._4,
      s"the planted corpus must make banding bind: ${rows.toSeq}")
    CacheRegistry.drain()
  }

  test("q192 drain capstone: the before phase covers the whole cloned " +
      "corpus, the after phase is independently zero, and exactly one " +
      "doc per cluster survives") {
    val rows = graft.SparkEntry.queries("q192_dedup_drain_capstone")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[String]("phase") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("clustered_docs"),
          r.getAs[Long]("n_docs")))).toMap
    val (bc, bd, bn) = rows("1_before")
    val (ac, ad, an) = rows("2_after")
    assert(ac == 0L && ad == 0L, s"drain must leave zero clusters: $rows")
    assert(an == bn - (bd - bc),
      s"survivors = corpus - (clustered - one keeper per cluster): $rows")
    assert(bc > 0 && bd >= 2 * bc, "planted corpus must actually cluster")
    CacheRegistry.drain()
  }

  test("q185 dup-mass histogram: cluster sizes, mass, and removable " +
      "count match a hand-derived corpus (clone doubling included)") {
    import spark.implicits._
    // A and B are near dups (one word changed in 20 → jaccard 17/19);
    // C is unrelated. q185 clones every doc at +1000000, so the expected
    // transitive clusters are {A, B, A', B'} (size 4) and {C, C'}
    // (size 2); no true singletons remain, so the size-1 row is zeros.
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    val b = a.replace(" w20", " zz")
    val c = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16 x17 x18 x19 x20"
    val dir = java.nio.file.Files.createTempDirectory("q185").toString
    Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q185_dup_mass_histogram")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("doc_mass"), r.getAs[Long]("removable")))
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 1L, 2L, 1L), (4L, 1L, 4L, 3L)),
      s"histogram mismatch: ${rows.toSeq}")
    CacheRegistry.drain()
  }
}
