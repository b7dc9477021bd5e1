package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisWinnowSpec extends SparkSpec {

  test("winnowing guarantee: docs sharing a long run share a fingerprint; " +
      "unrelated docs don't") {
    import spark.implicits._
    val shared = (0 until 30).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta"),
      (2L, s"one two three four five $shared six seven"),
      (3L, "entirely different words with no overlap at all here okay then"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprintRows(docs, "doc_id", "text", 3, 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Schleimer guarantee: any match of >= w+n-1 tokens shares a selected
    // fingerprint
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).isEmpty)
    assert((fps(2L) & fps(3L)).isEmpty)
  }

  test("winnowing density ~ 2/(w+1) and stats agree with fingerprint rows") {
    import spark.implicits._
    val words = (0 until 400).map(i => s"t${(i * 7919) % 1000}x$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val stats = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .collect()(0)
    val nRows = TextAnalysis.winnowFingerprintRows(docs, "doc_id", "text", 3, 4).count()
    assert(stats.getAs[Long]("n_kgrams") == 398L)
    assert(stats.getAs[Long]("n_fps") == nRows)
    // expected density 2/(w+1)=0.4; allow a generous band
    val density = stats.getAs[Long]("n_fps").toDouble / 398.0
    assert(density > 0.2 && density < 0.6, s"density $density out of band")
  }

  test("short doc (fewer than w kgrams) yields exactly one fingerprint") {
    import spark.implicits._
    val docs = Seq(
      (1L, "just four little tokens"),  // 2 kgrams < w=4
      (2L, "ab cd"))                    // < n tokens -> 1 whole-text kgram
      .toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kgrams"), r.getAs[Long]("n_fps"))).toMap
    assert(out(1L) == ((2L, 1L)))
    assert(out(2L) == ((1L, 1L)))
  }
}
