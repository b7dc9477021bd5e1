package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {

  test("ngram overlap flags planted eval leaks; decontaminated drops them") {
    import spark.implicits._
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different evaluation question about geometry"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight again"), // leak of 1
      (11L, "an unrelated training document about cooking pasta well"),
      (12L, "geometry question appears but shares too few shingles"))
      .toDF("doc_id", "text")
    val flagged = Contamination.ngramOverlap(
        corpus, bench, "doc_id", "text", shingleN = 3, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.toSeq == Seq((10L, 1L, 8L)))
    val clean = Contamination.decontaminated(
        corpus, bench, "doc_id", "text", shingleN = 3, minShared = 5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(clean == Seq(11L, 12L))
  }

  test("repetition signals: duplicate-token fraction and top bigram " +
      "expose looped text (the Gopher/C4 filter inputs)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "a perfectly normal sentence with unique words"),
      (3L, "go go go stop go go"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("dup_token_frac") > 0.8)
    assert(out(1L).getAs[String]("top_bigram") == "spam spam")
    assert(out(1L).getAs[Long]("top_bigram_cnt") == 5L)
    assert(out(2L).getAs[Double]("dup_token_frac") == 0.0)
    assert(out(3L).getAs[String]("top_bigram") == "go go")
    assert(out(3L).getAs[Long]("top_bigram_cnt") == 3L)
  }
}
