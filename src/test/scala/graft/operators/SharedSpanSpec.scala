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

  /** COMPLETENESS property (VERDICT r14 order #4): over seeded random
    * corpora with planted overlapping/nested/adjacent/duplicate spans,
    * `sharedSpanPairs` (uncapped) returns EXACTLY the maximal shared
    * token spans of length ≥ minSpan of every document pair — compared
    * against a brute-force reference that applies the DEFINITION of
    * maximality directly (left-boundary check + greedy right
    * extension, the check a suffix-array LCP walk performs), with no
    * shingles, no diagonals, no windows — a formulation the operator
    * shares nothing with. This pins the claim the gaps-and-islands
    * construction makes: the fixed shingle width n recovers every
    * maximal span of length ≥ n exactly (the Lee et al. 2022 exact-
    * substring semantics for spans ≥ n, without the suffix array).
    */
  test("PROPERTY: sharedSpanPairs == the by-definition maximal shared " +
      "spans on seeded random corpora (overlapping, nested, adjacent, " +
      "and whole-document planted matches), at two (shingleN, minSpan) " +
      "configurations") {
    def refSpans(ta: IndexedSeq[String], tb: IndexedSeq[String],
        minSpan: Int): Set[(Long, Long, Long)] = {
      val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      for (i <- ta.indices; j <- tb.indices
           if ta(i) == tb(j) && (i == 0 || j == 0 || ta(i - 1) != tb(j - 1))) {
        var l = 0
        while (i + l < ta.length && j + l < tb.length &&
          ta(i + l) == tb(j + l)) l += 1
        if (l >= minSpan) out += ((i.toLong, j.toLong, l.toLong))
      }
      out.toSet
    }

    for ((shingleN, minSpan) <- Seq((3, 4), (8, 10))) {
      val rnd = new scala.util.Random(42 + shingleN)
      val vocab = Vector("a", "b", "c", "d", "e", "f") // small: natural
      def rand(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val long = rand(minSpan * 2) // long shared block
      val nested = long.slice(2, 2 + minSpan) // its interior reappears
      val x = rand(minSpan + 3)
      val y = rand(minSpan)
      val doc1 = rand(7) ++ long ++ rand(5)
      val corpus: Seq[(Long, Vector[String])] = Seq(
        1L -> doc1,
        2L -> (rand(3) ++ long ++ rand(9)), // long match with 1
        3L -> (rand(4) ++ nested ++ rand(6)), // nested interior piece
        4L -> (rand(6) ++ x ++ y ++ rand(4)), // x,y ADJACENT here
        5L -> (rand(5) ++ x ++ rand(5) ++ y ++ rand(3)), // separated here
        6L -> doc1, // exact duplicate of 1
        7L -> rand(45), // noise: accidental matches welcome
        8L -> rand(45))
      val session = spark
      import session.implicits._
      val df = corpus.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")

      val want = (for {
        (ia, ta) <- corpus; (ib, tb) <- corpus
        if ia < ib
        s <- refSpans(ta, tb, minSpan)
      } yield (ia, ib, s._1, s._2, s._3)).toSet
      val got = Dedup.sharedSpanPairs(df, "doc_id", "text",
          minSpan = minSpan, shingleN = shingleN)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("start_a"), r.getAs[Long]("start_b"),
          r.getAs[Long]("span_tokens"))).toSet
      assert(got == want,
        s"(n=$shingleN, minSpan=$minSpan)\nmissing: ${want -- got}\n" +
          s"spurious: ${got -- want}")

      // the planted structures genuinely exercised the interesting cases
      val pair12 = want.filter(s => s._1 == 1L && s._2 == 2L)
      assert(pair12.exists(_._5 >= minSpan * 2), s"long match lost: $pair12")
      val pair45 = want.filter(s => s._1 == 4L && s._2 == 5L)
      assert(pair45.size >= 2,
        s"adjacent-vs-separated must stay two spans: $pair45")
      val pair16 = want.filter(s => s._1 == 1L && s._2 == 6L)
      assert(pair16.exists(_._5 == doc1.length.toLong),
        s"whole-document duplicate span lost: $pair16")
      assert(want.exists(s => s._1 == 3L || s._2 == 3L),
        "nested interior piece must match somewhere")
      CacheRegistry.drain()
    }
  }
}
