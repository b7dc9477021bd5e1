package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {

  /** Scalar interpolated-KN replay with the engine's decimal
    * summation rule.
    */
  private def reference(train: Seq[String], text: String,
      d: Double, alpha: Double): Option[(Long, Double)] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val bigs = train.map(toks).filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail))
    val cb = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cu = bigs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val f = bigs.distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val p = bigs.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = bigs.distinct.size.toLong
    val v = train.flatMap(toks).distinct.size.toLong
    def pc(w2: String): Double =
      (p.getOrElse(w2, 0L).toDouble + alpha) /
        (t.toDouble + alpha * v.toDouble)
    val ts = toks(text)
    if (ts.length < 2) None
    else {
      val lps = ts.zip(ts.tail).map { case (w1, w2) =>
        val prob = cu.get(w1) match {
          case Some(c1) =>
            (math.max(cb.getOrElse((w1, w2), 0L).toDouble - d, 0.0) /
              c1.toDouble) +
              ((d * f(w1).toDouble / c1.toDouble) * pc(w2))
          case None => pc(w2)
        }
        JBD.valueOf(math.log(prob)).setScale(12, RoundingMode.HALF_UP)
      }
      val sum = lps.foldLeft(JBD.ZERO)(_.add(_))
      Some((lps.size.toLong,
        JBD.valueOf(sum.doubleValue() / lps.size.toDouble)
          .setScale(6, RoundingMode.HALF_UP).doubleValue()))
    }
  }

  private val train = Seq(
    "the cat sat on the mat",
    "the cat sat on a hat",
    "a dog sat on the mat")

  test("every branch matches the scalar replay: seen bigram (discount " +
      "+ interpolation), unseen bigram in a seen context, unseen " +
      "context, unseen word") {
    val session = spark
    import session.implicits._
    val score = Seq(
      1L -> "the cat sat on the mat", // all bigrams seen
      2L -> "the dog naps",           // (the,dog) unseen, ctx seen; (dog,naps) unseen word
      3L -> "zzz the cat",            // unseen context zzz
      4L -> "xy"                      // outside the domain
    ).toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLogProbUnder(
        train.toDF("text"), score, "doc_id", "text",
        discount = 0.75, alpha = 0.4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
    assert(!out.contains(4L))
    val texts = Map(1L -> "the cat sat on the mat",
      2L -> "the dog naps", 3L -> "zzz the cat")
    for ((id, text) <- texts) {
      val want = reference(train, text, 0.75, 0.4).get
      assert(out(id) == want, s"doc $id: got ${out(id)}, want $want")
    }
  }

  test("KN ranks reference-like text above shuffled text (the filter " +
      "property) and guards reject invalid parameters") {
    val session = spark
    import session.implicits._
    val score = Seq(
      1L -> "the cat sat on the mat",
      2L -> "mat the on sat cat the").toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLogProbUnder(
        train.toDF("text"), score, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_logprob")).toMap
    assert(out(1L) > out(2L), out.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.kneserNeyLogProbUnder(score, score, "doc_id", "text",
        discount = 1.0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.kneserNeyLogProbUnder(score, score, "doc_id", "text",
        alpha = 0.0)
    }
  }
}
