package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TrigramBackoffSpec extends SparkSpec {

  /** Scalar stupid-backoff replay with the engine's decimal summation
    * rule — the DsirSpec reference convention.
    */
  private def reference(train: Seq[String], text: String,
      alpha: Double, backoff: Double): Option[(Long, Double)] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val tris = train.map(toks).filter(_.length >= 3)
      .flatMap(ts => ts.indices.dropRight(2).map(i => (ts(i), ts(i + 1), ts(i + 2))))
    val bigs = train.map(toks).filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail))
    val unis = train.flatMap(toks)
    val c3 = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = unis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = unis.size.toLong
    val v = unis.distinct.size.toLong
    val ts = toks(text)
    if (ts.length < 3) None
    else {
      val lps = ts.indices.dropRight(2).map { i =>
        val (w1, w2, w3) = (ts(i), ts(i + 1), ts(i + 2))
        val s = c3.get((w1, w2, w3)) match {
          case Some(x3) => x3.toDouble / c2((w1, w2)).toDouble
          case None => backoff * (c2.get((w2, w3)) match {
            case Some(xb) => xb.toDouble / c1(w2).toDouble
            case None => backoff *
              ((c1.getOrElse(w3, 0L).toDouble + alpha) /
                (n.toDouble + alpha * v.toDouble))
          })
        }
        JBD.valueOf(math.log(s)).setScale(12, RoundingMode.HALF_UP)
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

  test("every backoff level fires and matches the scalar replay: seen " +
      "trigram, bigram-backoff, smoothed-unigram floor, unseen word") {
    val session = spark
    import session.implicits._
    val score = Seq(
      // "the cat sat" seen twice / c2("the cat")=2 -> trigram level
      1L -> "the cat sat on the mat",
      // "mat dog sat": trigram unseen, bigram (dog, sat) seen -> level 2
      2L -> "mat dog sat",
      // "cat mat dog": trigram+bigram unseen, "dog" in vocab -> level 3
      3L -> "cat mat dog",
      // unseen word entirely -> smoothed floor with c1 = 0
      4L -> "the cat zebra",
      5L -> "xy" // < 3 tokens: outside the domain
    ).toDF("doc_id", "text")
    val out = TextAnalysis.trigramLogProbUnder(
        train.toDF("text"), score, "doc_id", "text",
        alpha = 0.4, backoff = 0.4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_logprob"))).toMap
    assert(!out.contains(5L))
    for (id <- 1L to 4L) {
      val text = Seq("the cat sat on the mat", "mat dog sat",
        "cat mat dog", "the cat zebra")(id.toInt - 1)
      val want = reference(train, text, 0.4, 0.4).get
      assert(out(id) == want, s"doc $id: got ${out(id)}, want $want")
    }
  }

  test("higher-order evidence dominates: a reference-like doc outscores " +
      "a shuffled-token doc of the same vocabulary") {
    val session = spark
    import session.implicits._
    val score = Seq(
      1L -> "the cat sat on the mat",
      2L -> "mat the on sat cat the").toDF("doc_id", "text")
    val out = TextAnalysis.trigramLogProbUnder(
        train.toDF("text"), score, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_logprob")).toMap
    assert(out(1L) > out(2L), out.toString)
  }

  test("invalid alpha/backoff are refused") {
    val session = spark
    import session.implicits._
    val df = Seq(1L -> "a b c").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.trigramLogProbUnder(df, df, "doc_id", "text", alpha = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trigramLogProbUnder(df, df, "doc_id", "text",
        backoff = 1.5)
    }
  }
}
