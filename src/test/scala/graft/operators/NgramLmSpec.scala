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
}
