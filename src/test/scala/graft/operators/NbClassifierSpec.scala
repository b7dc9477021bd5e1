package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import graft.SparkSpec

class NbClassifierSpec extends SparkSpec {

  private def toDf(rows: (Long, Boolean, String)*) = {
    val session = spark
    import session.implicits._
    rows.toDF("doc_id", "is_pos", "text")
  }

  test("nbQualityScore matches a hand-computed multinomial NB with " +
      "Laplace smoothing (decimal-quantized log terms, round-6 display)") {
    // pos tokens: good x3, fine x1 (Np=4); neg: bad x2, good x1 (Nn=3)
    // V=3; priors: dp=2, dn=1
    val labeled = toDf(
      (1L, true, "good good fine"),
      (2L, true, "good"),
      (3L, false, "bad bad good"))
    val a = 1.0
    def dec(x: Double): JBD =
      JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)
    def term(cp: Long, cn: Long): JBD =
      dec(math.log((cp + a) / (4 + a * 3)))
        .subtract(dec(math.log((cn + a) / (3 + a * 3))))
    val prior = dec(math.log(2.0)).subtract(dec(math.log(1.0)))
    def score(terms: Seq[JBD]): Double =
      JBD.valueOf(terms.foldLeft(prior)(_.add(_)).doubleValue())
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
    val tGood = term(3, 1); val tBad = term(0, 2); val tFine = term(1, 0)
    // score corpus: doc 10 all-pos words, doc 11 all-neg, doc 12 unseen
    val corpus = toDf(
      (10L, true, "good fine good"),
      (11L, true, "bad bad"),
      (12L, true, "novel"))
    val want = Map(
      10L -> score(Seq(tGood, tFine, tGood)),
      11L -> score(Seq(tBad, tBad)),
      12L -> score(Seq(term(0, 0))))

    val got = TextAnalysis.nbQualityScore(labeled, "is_pos", corpus,
        "doc_id", "text", alpha = a)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("score"),
          r.getAs[Boolean]("pred_pos")))).toMap
    assert(got.keySet == want.keySet)
    for ((id, (n, s, p)) <- got) {
      assert(s == want(id), s"doc $id: score $s != ${want(id)}")
      assert(p == (s > 0), s"doc $id: pred_pos inconsistent")
    }
    assert(got(10L)._2 > 0, "all-positive-vocabulary doc must score > 0")
    assert(got(11L)._2 < 0, "all-negative-vocabulary doc must score < 0")
    assert(got(10L)._1 == 3L && got(11L)._1 == 2L && got(12L)._1 == 1L)
    CacheRegistry.drain()
  }

  test("alpha <= 0 is refused; zero-token docs are outside the scored " +
      "domain") {
    intercept[IllegalArgumentException] {
      TextAnalysis.nbQualityScore(toDf((1L, true, "a")), "is_pos",
        toDf((1L, true, "a")), "doc_id", "text", alpha = 0.0)
    }
    val labeled = toDf((1L, true, "a"), (2L, false, "b"))
    val out = TextAnalysis.nbQualityScore(labeled, "is_pos",
        toDf((5L, true, ""), (6L, true, "a")), "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(6L), "empty doc must not be scored")
    CacheRegistry.drain()
  }

  test("saveNbRef + scoreUnderNbRef round-trips byte-identical to the " +
      "live-relation scoring (counts are exact longs)") {
    val labeled = toDf(
      (1L, true, "good good fine"),
      (2L, true, "good"),
      (3L, false, "bad bad good"))
    val corpus = toDf((10L, true, "good fine bad novel"))
    val dir = java.nio.file.Files.createTempDirectory("nb-model").toString
    TextAnalysis.saveNbRef(labeled, "is_pos", "text", dir)
    val live = TextAnalysis.nbQualityScore(labeled, "is_pos", corpus,
      "doc_id", "text").collect().map(_.toString).sorted.toSeq
    val saved = TextAnalysis.scoreUnderNbRef(spark, dir, corpus,
      "doc_id", "text").collect().map(_.toString).sorted.toSeq
    assert(live == saved, s"live=$live saved=$saved")
    CacheRegistry.drain()
  }

  test("q188 threshold sweep invariants: n_kept/recall/keep_frac " +
      "non-increasing in threshold, precision consistent with counts, " +
      "and the full ladder present") {
    val rows = graft.SparkEntry.queries("q188_nb_threshold_sweep")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("n_kept"),
        r.getAs[Double]("precision"), r.getAs[Double]("recall"),
        r.getAs[Double]("keep_frac")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (-10L to 10L by 2).toSeq)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._4 >= b._4 && a._5 >= b._5 },
      s"kept/recall/keep_frac must not increase with the threshold: " +
        rows.mkString(", "))
    // at a threshold keeping everything, precision = global positive rate
    // and recall = 1; somewhere the gate must actually bind
    val head = rows.head
    assert(head._4 == 1.0 || head._2 < rows.map(_._2).max,
      "ladder bottom should keep (nearly) everything")
    assert(rows.exists(_._2 < head._2), "ladder must bind somewhere")
    CacheRegistry.drain()
  }
}
