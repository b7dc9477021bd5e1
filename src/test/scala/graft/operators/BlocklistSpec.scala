package graft.operators

import graft.SparkSpec

class BlocklistSpec extends SparkSpec {

  test("term hits are word-boundary exact, phrase hits pair adjacent " +
      "tokens, and keep fires only on zero hits of either kind") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      1L -> "the scan is clean here",            // one term hit
      2L -> "a bad SCAN appears",                // case-insensitive term
      3L -> "scanner scans scanned",             // substrings must NOT fire
      4L -> "one bad scan and another bad scan", // repeated term
      5L -> "totally bad scan here",             // phrase "bad scan"
      7L -> "",                                  // empty text
      8L -> "scan"                               // single token, no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(docs, "text",
        terms = Seq("scan", "drop"), phrases = Seq("bad scan"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Long]("n_term_hits") == 1L) // "scan" in doc 1
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Long]("n_term_hits") == 1L) // SCAN lowercased
    assert(out(3L).getAs[Long]("n_term_hits") == 0L) // no substring match
    assert(out(3L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Long]("n_term_hits") == 2L)
    assert(out(4L).getAs[Long]("n_distinct_terms") == 1L)
    assert(out(5L).getAs[Long]("n_phrase_hits") == 1L)
    assert(out(7L).getAs[Long]("n_term_hits") == 0L)
    assert(out(7L).getAs[Boolean]("keep"))
    assert(out(8L).getAs[Long]("n_term_hits") == 1L)
    assert(out(8L).getAs[Long]("n_phrase_hits") == 0L) // bigram guard at n=1
  }

  test("whitespace-token semantics: tokens split on single spaces only, " +
      "so a newline-joined pair is one token and never a term/phrase hit") {
    val session = spark
    import session.implicits._
    val docs = Seq(1L -> "bad\nscan here").toDF("doc_id", "text")
    val row = TextAnalysis.blocklistFilter(docs, "text",
      terms = Seq("scan"), phrases = Seq("bad scan")).collect().head
    // "bad\nscan" is ONE whitespace token under the single-space split,
    // so neither the term nor the phrase fires — substring-safe
    assert(row.getAs[Long]("n_term_hits") == 0L)
    assert(row.getAs[Long]("n_phrase_hits") == 0L)
  }

  test("empty blocklist and malformed phrases are refused") {
    val session = spark
    import session.implicits._
    val docs = Seq(1L -> "x").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(docs, "text", terms = Nil, phrases = Nil)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(docs, "text", terms = Seq("a"),
        phrases = Seq("three word phrase"))
    }
  }
}
