package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  /** Independent scalar replay of the operator's formula (same IEEE
    * shape, BigDecimal quantization like the DECIMAL(20,12) cast).
    */
  private def contrib(tf: Long, dl: Long, df: Long, n: Double,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): BigDecimal = {
    val idf = math.log(1.0 + (n - df.toDouble + 0.5) / (df.toDouble + 0.5))
    val c = (idf * (tf.toDouble * (k1 + 1))) /
      (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
    BigDecimal(c).setScale(12, BigDecimal.RoundingMode.HALF_UP)
  }

  test("closed-form scores on a four-doc corpus: ranks, n_terms, and " +
      "6-decimal scores all match an independent scalar replay") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      1L -> "apple banana apple",
      2L -> "apple cherry",
      3L -> "banana banana cherry",
      4L -> "durian"
    ).toDF("doc_id", "text")
    val out = TfIdf.bm25TopK(docs, "doc_id", "text",
        queries = Seq("q1" -> "apple banana"), k = 10)
      .orderBy("rn").collect()
    val n = 4.0
    val avgdl = (3 + 2 + 3 + 1).toDouble / 4.0
    // df(apple)=2, df(banana)=2
    val s1 = contrib(2, 3, 2, n, avgdl) + contrib(1, 3, 2, n, avgdl)
    val s2 = contrib(1, 2, 2, n, avgdl)
    val s3 = contrib(2, 3, 2, n, avgdl)
    assert(out.length == 3) // doc 4 matches nothing
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 2L))
    assert(out(0).getAs[Long]("n_terms") == 2L)
    assert(out(1).getAs[Long]("n_terms") == 1L)
    def rounded(x: BigDecimal): Double =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Double]("score") == rounded(s1))
    assert(out(1).getAs[Double]("score") == rounded(s3))
    assert(out(2).getAs[Double]("score") == rounded(s2))
  }

  test("exact score ties break on the smaller doc id and k truncates") {
    val session = spark
    import session.implicits._
    // docs 10 and 20 are identical → identical scores → id ascending
    val docs = Seq(
      20L -> "apple pie",
      10L -> "apple pie",
      30L -> "pie only here with padding words"
    ).toDF("doc_id", "text")
    val out = TfIdf.bm25TopK(docs, "doc_id", "text",
        queries = Seq("q" -> "apple"), k = 1)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_id") == 10L)
    assert(out.head.getAs[Int]("rn") == 1)
  }

  test("query terms deduplicate: a repeated term scores once") {
    val session = spark
    import session.implicits._
    val docs = Seq(1L -> "apple apple").toDF("doc_id", "text")
    val once = TfIdf.bm25TopK(docs, "doc_id", "text",
      Seq("q" -> "apple"), k = 5).collect().head.getAs[Double]("score")
    val twice = TfIdf.bm25TopK(docs, "doc_id", "text",
      Seq("q" -> "apple apple"), k = 5).collect().head.getAs[Double]("score")
    assert(once == twice)
  }
}
