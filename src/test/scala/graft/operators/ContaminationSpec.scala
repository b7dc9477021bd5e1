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

  test("overlapFraction normalizes by the BENCH item's shingle total: " +
      "a short eval item fully inside a long doc is caught where the " +
      "absolute-count rule misses it, and the round-6 threshold is a " +
      "closed-form fraction") {
    import spark.implicits._
    // bench 1: short (5 tokens -> 3 distinct 3-shingles); bench 2: long
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, (0 until 40).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    // doc 10 embeds ALL of bench 1 inside 30 tokens of noise;
    // doc 11 shares exactly 3 shingles with bench 2 (same absolute
    // count as doc 10's hit, but 3/38 of bench 2's population)
    val corpus = Seq(
      (10L, ((0 until 15).map(i => s"x$i") ++
        Seq("alpha", "beta", "gamma", "delta", "epsilon") ++
        (15 until 30).map(i => s"x$i")).mkString(" ")),
      (11L, "b0 b1 b2 b3 b4 y0 y1 y2 y3 y4"))
      .toDF("doc_id", "text")
    val got = Contamination.overlapFraction(corpus, bench, "doc_id",
        "text", shingleN = 3, minFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // bench 1 has 3 distinct shingles, all in doc 10 -> frac 1.0;
    // doc 11's 3 shared of bench 2's 38 -> 0.078947, under threshold
    assert(got.toSeq == Seq((10L, 1L, 3L, 3L, 1.0)), got.mkString(","))
    // the absolute rule at the same floor misses nothing here but
    // cannot distinguish the two pairs: both share exactly 3 shingles
    val abs = Contamination.ngramOverlap(corpus, bench, "doc_id",
        "text", shingleN = 3, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(abs == Set((10L, 1L), (11L, 2L)))
    intercept[IllegalArgumentException] {
      Contamination.overlapFraction(corpus, bench, "doc_id", "text",
        shingleN = 3, minFrac = 0.0)
    }
    CacheRegistry.drain()
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

  test("spanContamination recovers a planted leak with exact offsets, " +
      "never pairs corpus with corpus or bench with bench, and drops " +
      "sub-minSpan overlaps") {
    val session = spark
    import session.implicits._
    def words(r: Range): String = r.map(i => s"w$i").mkString(" ")
    val bench = Seq(100L -> words(0 until 20)).toDF("doc_id", "text")
    val corpus = Seq(
      // tokens 5..14 of the benchmark item at corpus position 2
      1L -> ("x0 x1 " + words(5 until 15) + " x2"),
      // two corpus docs sharing 12 tokens with EACH OTHER but not
      // with the benchmark — must not appear
      2L -> words(50 until 62),
      3L -> words(50 until 62),
      // 5-token overlap with the benchmark: under minSpan
      4L -> ("y0 " + words(0 until 5))
    ).toDF("doc_id", "text")
    val out = Contamination.spanContamination(corpus, bench,
        "doc_id", "text", minSpan = 8, shingleN = 4)
      .collect()
    assert(out.length == 1, out.mkString(","))
    val r = out.head
    assert(r.getAs[Long]("corpus_id") == 1L)
    assert(r.getAs[Long]("bench_id") == 100L)
    assert(r.getAs[Long]("start_corpus") == 2L)
    assert(r.getAs[Long]("start_bench") == 5L)
    assert(r.getAs[Long]("span_tokens") == 10L)
    intercept[IllegalArgumentException] {
      Contamination.spanContamination(corpus, bench, "doc_id", "text",
        minSpan = 2, shingleN = 4)
    }
  }

  test("cutContamination removes exactly the leaked tokens (once, even " +
      "under overlapping spans from two benchmark items), empties a " +
      "whole-leak doc, and passes clean docs through in normal form") {
    val session = spark
    import session.implicits._
    def words(r: Range): String = r.map(i => s"w$i").mkString(" ")
    // two bench items OVERLAP on tokens 4..9 of the leaky corpus doc
    val bench = Seq(
      100L -> words(0 until 10),   // matches corpus tokens 2..11
      101L -> words(6 until 16)    // matches corpus tokens 8..17
    ).toDF("doc_id", "text")
    val corpus = Seq(
      1L -> ("x0 x1 " + words(0 until 16) + " x2 x3"), // 20 tokens
      2L -> words(0 until 10),                          // whole-doc leak
      3L -> "c0  c1   c2 c3 c4 c5 c6 c7 c8"             // clean, messy ws
    ).toDF("doc_id", "text")
    val out = Contamination.cutContamination(corpus, bench,
        "doc_id", "text", minSpan = 8, shingleN = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: spans [2,12) and [8,18) -> union [2,18) = 16 tokens removed
    assert(out(1L).getAs[Long]("n_spans") == 2L)
    assert(out(1L).getAs[Long]("removed_tokens") == 16L)
    assert(out(1L).getAs[String]("clean_text") == "x0 x1 x2 x3")
    // doc 2 was one big leak: empty, not dropped
    assert(out(2L).getAs[Long]("removed_tokens") == 10L)
    assert(out(2L).getAs[String]("clean_text") == "")
    // doc 3 untouched, whitespace-normalized
    assert(out(3L).getAs[Long]("n_spans") == 0L)
    assert(out(3L).getAs[Long]("removed_tokens") == 0L)
    assert(out(3L).getAs[String]("clean_text") ==
      "c0 c1 c2 c3 c4 c5 c6 c7 c8")
  }
}
