package graft.operators

import graft.SparkSpec

class SharedSpanSpec extends SparkSpec {

  private def words(r: Range): String = r.map(i => s"w$i").mkString(" ")

  private def toDf(rows: (Long, String)*) = {
    val session = spark
    import session.implicits._
    rows.toDF("doc_id", "text")
  }

  test("a planted quote is recovered with exact 0-based offsets and " +
      "span length") {
    // doc 2 = tokens 5..14 of doc 1 (10 tokens)
    val df = toDf(1L -> words(0 until 20), 2L -> words(5 until 15))
    val out = Dedup.sharedSpanPairs(df, "doc_id", "text",
      minSpan = 8, shingleN = 4).collect()
    assert(out.length == 1, out.mkString(","))
    val r = out.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Long]("start_a") == 5L)
    assert(r.getAs[Long]("start_b") == 0L)
    assert(r.getAs[Long]("span_tokens") == 10L)
  }

  test("two disjoint shared regions yield two maximal spans; a region " +
      "under minSpan is excluded") {
    // doc 2 carries A[0..5] then junk then A[12..16] (5 toks < minSpan 6)
    val df = toDf(
      1L -> words(0 until 20),
      2L -> (words(0 until 6) + " x0 x1 x2 x3 " + words(12 until 17)))
    val out = Dedup.sharedSpanPairs(df, "doc_id", "text",
        minSpan = 6, shingleN = 3)
      .collect().map(r => (r.getAs[Long]("start_a"),
        r.getAs[Long]("start_b"), r.getAs[Long]("span_tokens")))
    assert(out.toSet == Set((0L, 0L, 6L)), out.mkString(","))
  }

  test("the hot-shingle cap drops spans made ONLY of over-frequent " +
      "shingles (documented recall trade) and leaves others intact") {
    // the same 8-token phrase in 6 docs; a distinct pair shares a
    // different phrase only between docs 100 and 101
    val common = words(0 until 8)
    val docs = (1L to 6L).map(i => i -> s"$common y${i}a y${i}b y${i}c") ++
      Seq(100L -> ("z0 z1 " + words(50 until 58)),
        101L -> ("q0 q1 q2 " + words(50 until 58)))
    val unbounded = Dedup.sharedSpanPairs(toDf(docs: _*), "doc_id", "text",
      minSpan = 8, shingleN = 8).collect()
    assert(unbounded.length == 6 * 5 / 2 + 1, unbounded.length.toString)
    val capped = Dedup.sharedSpanPairs(toDf(docs: _*), "doc_id", "text",
        minSpan = 8, shingleN = 8, maxShingleFreq = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(capped.toSet == Set((100L, 101L)), capped.mkString(","))
  }

  test("minSpan below shingleN is refused") {
    intercept[IllegalArgumentException] {
      Dedup.sharedSpanPairs(toDf(1L -> "a b c"), "doc_id", "text",
        minSpan = 3, shingleN = 8)
    }
  }

  test("cutSharedSpans keeps the FIRST occurrence intact and cuts every " +
      "later copy: a whole-doc re-post comes back empty, a partial copy " +
      "loses only the shared span, untouched docs pass through verbatim") {
    // doc 1 original; doc 2 = exact re-post of 1's tokens 4..11;
    // doc 3 = that same span wrapped in its own prefix/suffix;
    // doc 4 shares nothing
    val span = words(4 until 12) // 8 tokens
    val df = toDf(
      1L -> words(0 until 20),
      2L -> span,
      3L -> (s"p0 p1 p2 $span s0 s1"),
      4L -> words(100 until 110))
    val out = Dedup.cutSharedSpans(df, "doc_id", "text",
        minSpan = 8, shingleN = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("removed_tokens")))).toMap
    assert(out(1L) == ((words(0 until 20), 0L, 0L)), s"original: ${out(1L)}")
    assert(out(2L) == (("", 1L, 8L)), s"re-post: ${out(2L)}")
    // doc 3 cuts the span it shares with docs 1 AND 2 (two evidence
    // rows, same tokens — removed counts tokens once)
    assert(out(3L) == (("p0 p1 p2 s0 s1", 2L, 8L)), s"partial: ${out(3L)}")
    assert(out(4L) == ((words(100 until 110), 0L, 0L)),
      s"untouched: ${out(4L)}")
    CacheRegistry.drain()
  }
}
