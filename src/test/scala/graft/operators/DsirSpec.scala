package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  /** Independent scalar replay of the whole DSIR pipeline: bigram
    * counts, smoothed log-probs with the engine's decimal summation
    * rule, weight join, md5-Gumbel keys — so the distributed result
    * must match rank-for-rank and key-for-key, not approximately.
    */
  private def reference(corpus: Seq[(Long, String)],
      targetIds: Set[Long], alpha: Double): Seq[(Long, Double, Double)] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    def model(docs: Seq[String]) = {
      val bigs = docs.map(toks).filter(_.length >= 2)
        .flatMap(ts => ts.zip(ts.tail))
      val cu = bigs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val cb = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = docs.flatMap(toks).distinct.size.toLong
      (cu, cb, v)
    }
    def avgLp(text: String, m: (Map[String, Long], Map[(String, String), Long], Long)): Option[Double] = {
      val (cu, cb, v) = m
      val ts = toks(text)
      if (ts.length < 2) None
      else {
        val lps = ts.zip(ts.tail).map { bg =>
          val lp = math.log((cb.getOrElse(bg, 0L) + alpha) /
            (cu.getOrElse(bg._1, 0L) + alpha * v))
          JBD.valueOf(lp).setScale(12, RoundingMode.HALF_UP)
        }
        val sum = lps.foldLeft(JBD.ZERO)(_.add(_))
        Some(JBD.valueOf(sum.doubleValue() / lps.size.toDouble)
          .setScale(6, RoundingMode.HALF_UP).doubleValue())
      }
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tm = model(corpus.filter(c => targetIds(c._1)).map(_._2))
    val rm = model(corpus.map(_._2))
    corpus.flatMap { case (id, text) =>
      for (t <- avgLp(text, tm); r <- avgLp(text, rm)) yield {
        val weight = t - r
        val h = java.lang.Long.parseLong(md5hex(id.toString).take(12), 16)
        val u = (h.toDouble + 0.5) / 281474976710656.0
        val g = JBD.valueOf(-math.log(-math.log(u)))
          .setScale(6, RoundingMode.HALF_UP).doubleValue()
        (id, weight, weight + g)
      }
    }
  }

  private val corpus = Seq(
    1L -> "spark rows spark rows spark rows spark",
    2L -> "spark rows spark rows batch",
    3L -> "pandas frame pandas frame pandas",
    4L -> "pandas frame batch pandas frame",
    5L -> "spark rows pandas frame batch",
    6L -> "batch batch batch spark rows",
    7L -> "short")

  test("ranks and keys match the scalar replay exactly, and the " +
      "sub-2-token doc is outside the scored domain") {
    val session = spark
    import session.implicits._
    val df = corpus.toDF("doc_id", "text")
    val target = df.filter(org.apache.spark.sql.functions.col("doc_id") <= 2)
    val got = Sampling.dsirSelect(target, df, df, "doc_id", "text", n = 10)
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("weight"), r.getAs[Double]("gumbel_key")))
    val want = reference(corpus, Set(1L, 2L), alpha = 0.4)
      .sortBy { case (id, _, key) => (-key, id) }
      .zipWithIndex
      .map { case ((id, wt, key), i) =>
        (i + 1L, id, wt,
          JBD.valueOf(key).setScale(6, RoundingMode.HALF_UP).doubleValue()) }
    assert(got.length == 6) // doc 7 has < 2 tokens
    assert(got.toSeq == want)
  }

  test("in-domain docs carry higher importance weights than " +
      "out-of-domain docs under a separated target") {
    val session = spark
    import session.implicits._
    val df = corpus.toDF("doc_id", "text")
    val target = df.filter(org.apache.spark.sql.functions.col("doc_id") <= 2)
    val weights = Sampling.dsirSelect(target, df, df, "doc_id", "text", n = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight"))
      .toMap
    // docs 1-2 define the target distribution; 3-4 are its complement
    assert(weights(1L) > weights(3L))
    assert(weights(2L) > weights(4L))
  }

  test("n truncates the selection and invalid n is refused") {
    val session = spark
    import session.implicits._
    val df = corpus.toDF("doc_id", "text")
    val target = df.filter(org.apache.spark.sql.functions.col("doc_id") <= 2)
    val out = Sampling.dsirSelect(target, df, df, "doc_id", "text", n = 3)
      .collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Sampling.dsirSelect(target, df, df, "doc_id", "text", n = 0)
    }
  }
}
