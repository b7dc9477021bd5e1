package graft.operators

import graft.SparkSpec

class GopherRulesSpec extends SparkSpec {

  /** A doc that passes every rule at the default bounds: 60 words of
    * length 3–10 with several required stopwords, no symbols, no
    * bullet/ellipsis lines.
    */
  private val clean =
    ((1 to 52).map(k => s"word$k") ++
      Seq("the", "of", "and", "that", "have", "with", "to", "be"))
      .mkString(" ")

  test("each rule fires alone: one violating doc per rule, the clean " +
      "doc keeps, and every signal column reads its closed-form value") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      1L -> clean,
      2L -> "too short the of", // n_words < 50
      // mean word length > 10: 60 long words (+ stopwords to isolate)
      3L -> ((1 to 58).map(k => s"verylongword$k").mkString(" ") +
        " the of"),
      // symbol ratio: 10 hashes over ~60 words > 0.1
      4L -> (clean + " " + Seq.fill(10)("#").mkString(" ")),
      // all lines bulleted (fraction 1.0 > 0.9) — word content clean
      5L -> (1 to 5).map(i => "- " + clean).mkString("\n"),
      // every other line ends with an ellipsis (0.5 > 0.3)
      6L -> Seq(clean + " ...", clean, clean + "…", clean).mkString("\n"),
      // alpha fraction: 20 number-words dilute below 0.8
      7L -> (clean + " " + (1 to 20).map(_.toString).mkString(" ")),
      // only one distinct required stopword (< 2)
      8L -> ((1 to 59).map(k => s"word$k").mkString(" ") + " the")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityRules(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), out(1L).toString)
    for (id <- 2L to 8L)
      assert(!out(id).getAs[Boolean]("keep"), s"doc $id must fail")
    // closed-form spot checks
    assert(out(1L).getAs[Long]("n_words") == 60L)
    assert(out(1L).getAs[Long]("n_stop_kinds") == 8L)
    assert(out(4L).getAs[Double]("symbol_ratio") == 10.0 / 70.0)
    assert(out(5L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(out(6L).getAs[Double]("ellipsis_line_frac") == 0.5)
    assert(out(7L).getAs[Double]("alpha_word_frac") == 60.0 / 80.0)
    assert(out(8L).getAs[Long]("n_stop_kinds") == 1L)
    // the isolated violations leave the OTHER signals in bounds
    assert(out(4L).getAs[Double]("alpha_word_frac") >= 0.8 - 1e-9 ||
      out(4L).getAs[Long]("n_words") == 70L)
  }

  test("c4LineFilters: line rules (terminal punctuation, word minimum, " +
      "javascript tell) and page rules (kept minimum, brace, lorem " +
      "ipsum) each fire on their own line/page") {
    val session = spark
    import session.implicits._
    val good = "Here is a perfectly ordinary retained sentence."
    val docs = Seq(
      // three good lines, one dropped per line rule → page keeps
      1L -> Seq(good, "no terminal punctuation here at all", "Too few.",
        "A line about JAVASCRIPT widgets everywhere today.",
        good, good).mkString("\n"),
      // only two good lines → page fails the kept minimum
      2L -> Seq(good, good).mkString("\n"),
      // brace kills the page even though lines are fine
      3L -> Seq(good, good, good, "A stray { appears in this line.")
        .mkString("\n"),
      // lorem ipsum kills the page (case-insensitive)
      4L -> Seq(good, good, good, "LOREM IPSUM filler sentence here.")
        .mkString("\n")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilters(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("page_keep"))
    assert(out(1L).getAs[Long]("n_kept") == 3L &&
      out(1L).getAs[Long]("n_lines") == 6L)
    assert(out(1L).getAs[String]("clean_text") ==
      Seq(good, good, good).mkString("\n"))
    assert(!out(2L).getAs[Boolean]("page_keep") &&
      out(2L).getAs[Long]("n_kept") == 2L)
    // the brace line itself is retained (it is a proper sentence) but
    // the PAGE dies — the two rule levels are independent
    assert(!out(3L).getAs[Boolean]("page_keep") &&
      out(3L).getAs[Long]("n_kept") == 4L)
    assert(!out(4L).getAs[Boolean]("page_keep") &&
      out(4L).getAs[Long]("n_kept") == 4L)
  }

  test("empty and whitespace-only text: zero signals, keep = false") {
    val session = spark
    import session.implicits._
    val docs = Seq(1L -> "", 2L -> "   \n  ").toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityRules(docs, "text").collect()
    assert(out.forall(!_.getAs[Boolean]("keep")))
    assert(out.forall(_.getAs[Long]("n_words") == 0L))
  }

  test("corpusCard: every column matches a hand computation on a " +
      "fixture with duplicates, short docs, and planted PII — dup mass " +
      "counts docs beyond the first of each NORMALIZED fingerprint") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "a", "one two three four five"),
      (2L, "a", "one two three four five"), // exact dup of 1
      (3L, "a", "  ONE two   three four FIVE "), // normalized dup of 1
      (4L, "a", "short doc"), // short (< 3 tokens threshold below? no: count)
      (5L, "b", "mail me at x@y.cz or http://z.example/q 123456789 now"),
      (6L, "b", "six seven eight")
    ).toDF("doc_id", "source", "text")
    val card = TextAnalysis.corpusCard(docs, "doc_id", "text", "source",
        shortDocTokens = 4)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = card("a")
    assert(a.getAs[Long]("n_docs") == 4L)
    assert(a.getAs[Long]("n_tokens") == 17L) // 5+5+5+2
    assert(a.getAs[Long]("n_dup_docs") == 2L,
      "docs 2 AND 3 (case/whitespace variant) are dup mass")
    assert(a.getAs[Long]("n_short_docs") == 1L) // doc 4 (2 < 4)
    assert(a.getAs[Double]("mean_tokens") == 17.0 / 4.0)
    assert(a.getAs[Long]("n_emails") == 0L)
    val b = card("b")
    assert(b.getAs[Long]("n_docs") == 2L)
    assert(b.getAs[Long]("n_dup_docs") == 0L)
    assert(b.getAs[Long]("n_emails") == 1L)
    assert(b.getAs[Long]("n_urls") == 1L)
    assert(b.getAs[Long]("n_digit_runs") == 1L)
    CacheRegistry.drain()
  }
}
