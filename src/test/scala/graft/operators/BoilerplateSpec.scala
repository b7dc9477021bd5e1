package graft.operators

import graft.SparkSpec

/** Line-level boilerplate removal + n-gram heavy hitters (the corpus
  * chrome / template-mining tier).
  */
class BoilerplateSpec extends SparkSpec {

  import org.apache.spark.sql.functions.col

  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta\nCookie notice\ngamma delta", "web"),
      (2L, "epsilon zeta\nCookie notice\n  Cookie notice  ", "web"),
      (3L, "unique only here\nCookie notice", "print"),
      (4L, "Cookie notice", "print"))
      .toDF("doc_id", "text", "source")
  }

  test("boilerplateLines thresholds on DISTINCT document frequency of " +
      "the trimmed line; empty lines never count") {
    val bp = TextAnalysis.boilerplateLines(corpus(), "doc_id", "text", 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'Cookie notice' appears in 4 docs (twice in doc 2 — distinct!)
    assert(bp == Map("Cookie notice" -> 4L))
  }

  test("removeBoilerplate keeps original line order, counts removals, " +
      "and keeps fully-boilerplate docs with empty text") {
    val out = TextAnalysis.removeBoilerplate(corpus(), "doc_id", "text", 3L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned_text")))).toMap
    assert(out(1L) == ((2L, 1L, "alpha beta\ngamma delta")))
    // doc 2: both 'Cookie notice' variants trim to the boilerplate line
    assert(out(2L) == ((1L, 2L, "epsilon zeta")))
    assert(out(3L) == ((1L, 1L, "unique only here")))
    assert(out(4L) == ((0L, 1L, "")))
  }

  test("ngramHeavyHitters ranks per group with the deterministic " +
      "(count DESC, ngram ASC) tiebreak") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c", "s1"),   // 'a b c' x2, 'b c a' x1, 'c a b' x1
      (2L, "a b c", "s1"),
      (3L, "x y z", "s2"),
      (4L, "tiny", "s2"))          // < n tokens -> whole-text shingle
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.ngramHeavyHitters(docs, "source", "doc_id",
        "text", 3, 2)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rk")) ->
        ((r.getAs[String]("ngram"), r.getAs[Long]("cnt")))).toMap
    assert(out(("s1", 1)) == (("a b c", 3L)))
    assert(out(("s1", 2)) == (("b c a", 1L)))  // ties broken by ngram ASC
    assert(out(("s2", 1)) == (("tiny", 1L)) || out(("s2", 1)) == (("x y z", 1L)))
    // both s2 shingles count 1: ASC tiebreak puts 'tiny' first
    assert(out(("s2", 1)) == (("tiny", 1L)))
  }

  test("dedupParagraphs keeps the FIRST occurrence (min doc, then min " +
      "line) of every duplicated line, never dedupes empty lines, and " +
      "dedupes within a single document too") {
    import spark.implicits._
    val df = Seq(
      (1L, "A\nB"),
      (2L, "B\nC"),      // B first occurred in doc 1 -> dropped here
      (3L, "\nB\n\nD"),  // empties kept; B dropped
      (4L, "E\nE"))      // within-doc duplicate: second E drops
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupParagraphs(df, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned_text")))).toMap
    assert(out(1L) == ((2L, 0L, "A\nB")))
    assert(out(2L) == ((1L, 1L, "C")))
    assert(out(3L) == ((3L, 1L, "\n\nD")))
    assert(out(4L) == ((1L, 1L, "E")))
    CacheRegistry.drain()
  }
}
