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
