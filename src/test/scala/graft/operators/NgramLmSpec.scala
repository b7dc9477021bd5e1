package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {

  test("bigramLogProb matches a hand-computed add-α model (decimal-cast " +
      "log terms, round-6 mean); sub-2-token docs are dropped") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "x")).toDF("doc_id", "text")
    // corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1; cu: a->3, b->2; V=4
    val a = 0.5
    def lp(cb: Long, cu: Long): JBD =
      JBD.valueOf(math.log((cb + a) / (cu + a * 4)))
        .setScale(12, RoundingMode.HALF_UP)
    def mean(lps: Seq[JBD]): Double =
      JBD.valueOf(lps.foldLeft(JBD.ZERO)(_.add(_)).doubleValue() / lps.size)
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
    val lpAB = lp(3, 3); val lpBA = lp(1, 2); val lpBC = lp(1, 2)
    val expected = Map(
      1L -> (3L, mean(Seq(lpAB, lpBA, lpAB))),
      2L -> (2L, mean(Seq(lpAB, lpBC))))

    val got = TextAnalysis.bigramLogProb(df, "doc_id", "text", alpha = a)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected, s"got $got, expected $expected")
  }

  test("bigramLogProb == a full Scala reference model on seeded RANDOM " +
      "corpora (not just the hand-computed fixture)") {
    val session = spark
    import session.implicits._
    for (seed <- Seq(3, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 12).map(i => s"t$i")
      val docs = (0 until 25).map { i =>
        val len = 1 + rnd.nextInt(15) // some single-token docs
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val alpha = 0.4
      val toks = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val bigrams = toks.toSeq.flatMap { case (id, ts) =>
        if (ts.size >= 2) ts.sliding(2).map(p => (id, p(0), p(1))).toSeq
        else Nil }
      val cu = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
      val cb = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
      val v = toks.values.flatten.toSet.size
      val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
        val lps = bs.map { case (_, w1, w2) =>
          JBD.valueOf(math.log((cb((w1, w2)) + alpha) / (cu(w1) + alpha * v)))
            .setScale(12, RoundingMode.HALF_UP) }
        val mean = JBD.valueOf(
            lps.foldLeft(JBD.ZERO)(_.add(_)).doubleValue() / lps.size)
          .setScale(6, RoundingMode.HALF_UP).doubleValue()
        id -> (bs.size.toLong, mean)
      }
      val got = TextAnalysis
        .bigramLogProb(docs.toDF("doc_id", "text"), "doc_id", "text", alpha)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(got == expected, s"seed $seed")
      CacheRegistry.drain()
    }
  }

  test("gibberish scores below natural repetition under the corpus's own " +
      "statistics (the filtering property)") {
    val session = spark
    import session.implicits._
    // common docs share phrasing; the outlier's bigrams are all unique
    val common = (1L to 8L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog number $i"))
    val outlier = Seq((99L, "zq xv qp wk jn bv mz ty")) // unseen bigrams
    val scores = TextAnalysis
      .bigramLogProb((common ++ outlier).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val commonAvg = common.map(c => scores(c._1)).sum / common.size
    assert(scores(99L) < commonAvg - 1.0,
      s"outlier ${scores(99L)} should score well below common $commonAvg")
  }

  test("bigramLogProbUnder: train==score equals bigramLogProb exactly; " +
      "unseen n-grams take the LEFT-JOIN smoothing mass instead of " +
      "vanishing from the mean") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "a c b a")).toDF("doc_id", "text")
    val self = TextAnalysis.bigramLogProbUnder(df.select("text"), df,
        "doc_id", "text", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val base = TextAnalysis.bigramLogProb(df, "doc_id", "text", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(self == base, s"$self vs $base")
    // score a doc the reference never saw: both the unseen-context
    // case (cu miss -> ln(α/(αV)) = ln(1/V)) and the seen-context /
    // unseen-bigram case (cb miss only) must appear in the mean
    val eval = Seq((9L, "z z a z")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProbUnder(df.select("text"), eval,
        "doc_id", "text", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // train: cu(a)=3,cu(b)=2,cu(c)=1? bigrams: (a,b)x3,(b,a)x2,(b,c)x1,
    // (a,c)x1,(c,b)x1 -> cu: a=4, b=3, c=1; V=3 (a,b,c)
    def lp(cb: Long, cu: Long): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(
        math.log((cb + 0.5) / (cu + 0.5 * 3)))
        .setScale(12, java.math.RoundingMode.HALF_UP)
    val lps = Seq(lp(0, 0), lp(0, 0), lp(0, 4)) // (z,z),(z,a),(a,z)
    val want = java.math.BigDecimal.valueOf(
      lps.foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue() / 3)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got(9L) == ((3L, want)), s"got ${got(9L)}, want (3, $want)")
  }

  test("saveBigramRef -> scoreUnderBigramRef is byte-identical to the " +
      "live bigramLogProbUnder on the same reference (the train-once " +
      "production lifecycle)") {
    val session = spark
    import session.implicits._
    val train = Seq("a b a b", "a b c", "a c b a").toDF("text")
    val eval = Seq((1L, "a b z"), (2L, "c b a b"), (3L, "z z"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bigram-ref")
      .toString
    TextAnalysis.saveBigramRef(train, "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val live = rows(TextAnalysis.bigramLogProbUnder(train, eval,
      "doc_id", "text", alpha = 0.4))
    val saved = rows(TextAnalysis.scoreUnderBigramRef(spark, dir, eval,
      "doc_id", "text", alpha = 0.4))
    assert(saved == live, s"$saved vs $live")
    assert(live.nonEmpty && live.map(_._1).toSet == Set(1L, 2L, 3L))
    CacheRegistry.drain()
  }

  test("perplexityFilter drops the EXACT floor(dropFrac*n) lowest " +
      "(score, id) pairs — tie-break on id, k=0 keeps all, and the " +
      "histogram-pruned selection agrees with a driver-side sort") {
    val session = spark
    import session.implicits._
    // engineered ties: scores repeat across ids
    val rows = (1L to 37L).map(i => (i, (i % 7).toDouble / 10.0))
    val scored = rows.toDF("doc_id", "avg_logprob")
    for (frac <- Seq(0.0, 0.25, 0.5, 0.9)) {
      val got = TextAnalysis.perplexityFilter(scored, "doc_id",
          "avg_logprob", frac)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      val k = math.floor(frac * 37).toInt
      val dropped = rows.sortBy { case (id, s) => (s, id) }.take(k)
        .map(_._1).toSet
      val want = rows.map { case (id, _) => id -> !dropped(id) }.toMap
      assert(got == want, s"frac=$frac: diverges from reference sort")
      CacheRegistry.drain()
    }
  }

  test("groupedPerplexityFilter drops floor(dropFrac*n_g) per GROUP — " +
      "ties on id, k=0 groups keep all, degenerate single-score groups " +
      "stay exact, and a 2-bucket histogram agrees with per-group sort") {
    val session = spark
    import session.implicits._
    // group A: 9 rows with tie mass; B: 3 rows (k=0 at 0.25); C: 6 rows
    // all the SAME score (one bucket holds the whole group); D: 1 row
    val rows =
      (1L to 9L).map(i => ("A", i, (i % 3).toDouble / 10.0)) ++
      (10L to 12L).map(i => ("B", i, i.toDouble)) ++
      (13L to 18L).map(i => ("C", i, 0.5)) ++
      Seq(("D", 19L, -1.0))
    val scored = rows.toDF("grp", "doc_id", "score")
    for (frac <- Seq(0.0, 0.25, 0.5); nb <- Seq(2, 4096)) {
      val got = TextAnalysis.groupedPerplexityFilter(scored, "grp",
          "doc_id", "score", frac, buckets = nb)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Boolean]("keep")).toMap
      val want = rows.groupBy(_._1).flatMap { case (_, grows) =>
        val k = math.floor(frac * grows.size).toInt
        val dropped = grows.sortBy { case (_, id, s) => (s, id) }.take(k)
          .map(_._2).toSet
        grows.map { case (_, id, _) => id -> !dropped(id) }
      }
      assert(got == want, s"frac=$frac buckets=$nb: diverges from " +
        "per-group reference sort")
      CacheRegistry.drain()
    }
  }

  test("groupedPerplexityFilter with scores FINER than the 6-decimal " +
      "grid still drops exactly floor(dropFrac*n_g) per group (grid " +
      "semantics: rank and gate share the micro-integer key)") {
    val session = spark
    import session.implicits._
    // adjacent scores that collapse to the SAME micro-int value: under
    // the old raw-score gate the rank (on the grid) and the keep
    // comparison (on raw) disagreed and the drop count could drift
    val rows = (1L to 24L).map(i => ("G", i, 0.1 + i.toDouble * 1e-9)) ++
      (25L to 30L).map(i => ("H", i, i.toDouble * 1e-8))
    val scored = rows.toDF("grp", "doc_id", "score")
    for (frac <- Seq(0.25, 0.5)) {
      val kept = TextAnalysis.groupedPerplexityFilter(scored, "grp",
          "doc_id", "score", frac)
        .collect().map(r => (r.getAs[String]("grp"),
          r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep")))
      for ((g, n) <- Seq(("G", 24), ("H", 6))) {
        val dropped = kept.filter(r => r._1 == g && !r._3).map(_._2)
        val k = math.floor(frac * n).toInt
        assert(dropped.length == k,
          s"group $g frac=$frac dropped ${dropped.length} != $k")
        // grid ties broken by id: the dropped set is the k smallest
        // (round-6 score, id) — here all grid-tied, so the k lowest ids
        val ids = rows.filter(_._1 == g).map(_._2).sorted.take(k).toSet
        assert(dropped.toSet == ids, s"group $g frac=$frac: $dropped")
      }
      CacheRegistry.drain()
    }
  }
}
