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
}
