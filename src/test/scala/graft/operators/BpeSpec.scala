package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the distributed BPE learner against a naive driver-side
  * reference implementation of Sennrich et al. 2016 (greedy leftmost
  * non-overlapping merges, count-desc / lex-asc tiebreak) on random
  * corpora engineered to hit ties and overlapping-pair cases.
  */
class BpeSpec extends SparkSpec {

  /** Reference: merge learning on an in-memory word-count map. */
  private def refMerges(
      wordCounts: Map[String, Long],
      numMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toVector :+ "</w>") -> c
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) =
          pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), pc) = pairs.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, pc))
        vocab = vocab.map { case (syms, c) =>
          val r = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              r += (a + b); i += 2
            } else { r += syms(i); i += 1 }
          }
          r.result() -> c
        }
        k += 1
      }
    }
    out.toSeq
  }

  private def refWordCounts(docsSeq: Seq[String]): Map[String, Long] =
    docsSeq.flatMap(_.split(" "))
      .filter(w => w.nonEmpty && w.forall(Character.isLetter))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  private def randomCorpus(seed: Int, nDocs: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // 3-letter alphabet + short words → dense pair-count ties, repeated
    // letters → overlapping-occurrence ("a a a") merge cases
    Seq.fill(nDocs) {
      Seq.fill(3 + rnd.nextInt(10)) {
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString
      }.mkString(" ")
    }
  }

  /** Reference byte-level pre-tokenization (java.util.regex, driver
    * side): GPT-2-style runs with the leading-space → `Ġ` rewrite.
    */
  private def refBytelevelTokens(t: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile(" ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+").matcher(t)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) buf += m.group().replaceFirst("^ ", "Ġ")
    buf.toSeq
  }

  private def refBytelevelCounts(docsSeq: Seq[String]): Map[String, Long] =
    docsSeq.flatMap(refBytelevelTokens)
      .filter(w => w.nonEmpty && w.length <= 32)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("bytelevel pre-tokenizer: punctuation and digit runs become " +
      "learnable vocabulary (not OOV) and merge learning matches the " +
      "naive reference over the GPT-2-style split") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // letter words + digit runs + punctuation runs + contractions-ish
    // apostrophes, with and without leading spaces; ties on purpose
    val corpus = Seq.fill(50) {
      Seq.fill(3 + rnd.nextInt(8)) {
        rnd.nextInt(5) match {
          case 0 => Seq.fill(1 + rnd.nextInt(4))(('a' + rnd.nextInt(3)).toChar).mkString
          case 1 => (10 + rnd.nextInt(90)).toString
          case 2 => Seq("!!", "...", ",", "?!", "''")(rnd.nextInt(5))
          case 3 => "ab's"
          case _ => "ab" + Seq("!", "?", ".")(rnd.nextInt(3))
        }
      }.mkString(" ")
    }
    spark.conf.set(Bpe.PretokenizerConf, "bytelevel")
    try {
      val model = Bpe.learnMerges(corpus.toDF("text"), "text",
        numMerges = 15)
      val got = model.merges.map(r => (r.left, r.right, r.pairCount))
      val want = refMerges(refBytelevelCounts(corpus), 15)
      assert(got == want, s"\n got=$got\nwant=$want")
      // the vocabulary genuinely carries the leading-space convention
      // and punctuation/digit tokens — the whitespace mode's OOV class
      val words = model.vocab.select("w").collect()
        .map(_.getString(0)).toSet
      assert(words.exists(_.startsWith("Ġ")), s"no Ġ-words: $words")
      assert(words.exists(w => w.exists(c => !Character.isLetter(c) &&
        c != 'Ġ')), s"no punct/digit tokens entered the vocab: $words")
      // whitespace mode (default conf) is untouched: same corpus,
      // letters-only vocabulary
      spark.conf.unset(Bpe.PretokenizerConf)
      val ws = Bpe.learnMerges(corpus.toDF("text"), "text", numMerges = 5)
      assert(ws.vocab.select("w").collect().map(_.getString(0))
        .forall(_.forall(Character.isLetter)))
      assert(ws.merges.map(r => (r.left, r.right, r.pairCount)) ==
        refMerges(refWordCounts(corpus), 5))
    } finally spark.conf.unset(Bpe.PretokenizerConf)
    CacheRegistry.drain()
  }

  test("bytelevel encode → decode round-trips punctuation, digits, and " +
      "spacing exactly (the regex-reconstruction contract), and the " +
      "bytes OOV page restores the leading space of a fallback token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab ab, cd!! 12 ab's"),
      (2L, "abc... 99 ?! ab  cd"), // double space: one survives (doc'd)
      (3L, ",,ab 7cd"))
    spark.conf.set(Bpe.PretokenizerConf, "bytelevel")
    try {
      val df = docs.toDF("doc_id", "text")
      val model = Bpe.learnMerges(df.select("text"), "text", numMerges = 10)
      val enc = Bpe.encodeIds(df, "doc_id", "text", model)
      val dec = Bpe.decodeIds(enc, "doc_id", "token_ids", model)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      for ((id, t) <- docs)
        assert(dec(id) == refBytelevelTokens(t)
          .map(_.replaceFirst("^Ġ", " ")).mkString(""),
          s"doc $id: got '${dec(id)}'")
      // punctuation genuinely round-trips through learned ids
      assert(dec(1L).contains("ab,") && dec(1L).contains("!!"))
      // byte-fallback under bytelevel: an out-of-alphabet token that
      // carried a leading space decodes with the SPACE, not the marker
      spark.conf.set(Bpe.OovModeConf, "bytes")
      val eval = Seq((9L, "ab ** ab zz")).toDF("doc_id", "text")
      val ids = Bpe.applyModel(eval, "doc_id", "text", model)
      val back = Bpe.decodeIds(ids, "doc_id", "token_ids", model)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(back(9L) == "ab ** ab zz", s"got '${back(9L)}'")
      // the MODE IS A MODEL PROPERTY: save the bytelevel model, unset
      // every conf, load it in a "different job" — apply/decode still
      // run byte-level (a train/apply mode mismatch, which would
      // silently tokenize garbage, is unrepresentable)
      val dir = java.nio.file.Files.createTempDirectory("bpe-bl").toString
      Bpe.saveModel(model, dir)
      spark.conf.unset(Bpe.PretokenizerConf)
      spark.conf.unset(Bpe.OovModeConf)
      val loaded = Bpe.loadModel(spark, dir)
      assert(loaded.pretokenizer == "bytelevel")
      val df2 = docs.toDF("doc_id", "text")
      val dec2 = Bpe.decodeIds(
          Bpe.encodeIds(df2, "doc_id", "text", loaded),
          "doc_id", "token_ids", loaded)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      for ((id, t) <- docs)
        assert(dec2(id) == refBytelevelTokens(t)
          .map(_.replaceFirst("^Ġ", " ")).mkString(""),
          s"loaded-model doc $id: got '${dec2(id)}'")
      // truncate propagates the mode too
      assert(Bpe.truncate(loaded, 3).pretokenizer == "bytelevel")
    } finally {
      spark.conf.unset(Bpe.PretokenizerConf)
      spark.conf.unset(Bpe.OovModeConf)
    }
    CacheRegistry.drain()
  }

  test("learnMerges matches the naive Sennrich reference on random " +
      "tie-heavy corpora") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val corpus = randomCorpus(seed, 60)
      val df = corpus.toDF("text")
      val model = Bpe.learnMerges(df, "text", numMerges = 15)
      val got = model.merges.map(r => (r.left, r.right, r.pairCount))
      val want = refMerges(refWordCounts(corpus), 15)
      assert(got == want, s"seed=$seed\n got=$got\nwant=$want")
      CacheRegistry.drain()
    }
  }

  test("incremental learnMerges equals the full-rescan formulation — " +
      "identical rules and identical vocabulary at every merge depth") {
    import spark.implicits._
    val corpus = randomCorpus(13, 80)
    val df = corpus.toDF("text")
    // every depth 1..12: rule-list equality alone would hide a vocab
    // divergence that only changes LATER choices; comparing the full
    // (w, cnt, sym) relation at each depth pins the loop state itself.
    // topM = 1 forces the exact sequential loop — the pure
    // incremental-vs-rescan comparison, no batching in play.
    for (n <- 1 to 12) {
      val inc = Bpe.learnMergesWith(df, "text", numMerges = n, topM = 1,
        incremental = true)
      val ref = Bpe.learnMergesFullRescan(df, "text", numMerges = n)
      assert(inc.merges == ref.merges, s"n=$n rules diverge")
      val iv = inc.vocab.select("w", "cnt", "sym").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
      val rv = ref.vocab.select("w", "cnt", "sym").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
      assert(iv.sameElements(rv), s"n=$n vocab diverges")
      CacheRegistry.drain()
    }
  }

  test("batched learning is sequential-exact: every (formulation, topM) " +
      "combination equals the full rescan — rules AND vocabulary") {
    import spark.implicits._
    // tie-heavy corpora (3-letter alphabet) stress the blocker bound:
    // candidates at equal counts must never upset the kept prefix
    for (seed <- Seq(3, 13, 29)) {
      val corpus = randomCorpus(seed, 80)
      val df = corpus.toDF("text")
      val ref = Bpe.learnMergesFullRescan(df, "text", numMerges = 18)
      val rv = ref.vocab.select("w", "cnt", "sym").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
      for {
        topM <- Seq(4, 16, 64)
        incremental <- Seq(true, false)
      } {
        val got = Bpe.learnMergesWith(df, "text", numMerges = 18,
          topM = topM, incremental = incremental)
        assert(got.merges == ref.merges,
          s"seed=$seed topM=$topM inc=$incremental rules diverge:\n" +
            s" got=${got.merges}\nwant=${ref.merges}")
        val gv = got.vocab.select("w", "cnt", "sym").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
        assert(gv.sameElements(rv),
          s"seed=$seed topM=$topM inc=$incremental vocab diverges")
        CacheRegistry.drain()
      }
      CacheRegistry.drain()
    }
  }

  test("selectBatch admission: disjoint prefix accepted, conflicts and " +
      "known-merged collisions block, blocker bound strict") {
    // plain disjoint candidates, no truncation: all accepted
    val disjoint = Seq((10L, "a", "b"), (8L, "c", "d"), (5L, "e", "f"))
    assert(Bpe.selectBatch(disjoint, truncated = false, maxRules = 10) ==
      disjoint)
    // chain conflict ((a,b) then (b,c): sites overlap at the shared b)
    // blocks itself AND — via the strict bound — every later accepted
    // pair at or below its count
    val conflict = Seq((10L, "a", "b"), (8L, "b", "c"), (8L, "e", "f"),
      (5L, "g", "h"))
    assert(Bpe.selectBatch(conflict, truncated = false, maxRules = 10) ==
      Seq((10L, "a", "b")))
    // same-RIGHT and same-LEFT families do NOT interfere (applying
    // (a,w) never changes count((b,w)) — only right=a / left=w pairs
    // change) and batch whole: the early `(x, </w>)` era of any corpus
    val sameRight = Seq((10L, "a", "w"), (9L, "b", "w"), (8L, "c", "w"))
    assert(Bpe.selectBatch(sameRight, truncated = false, maxRules = 10) ==
      sameRight)
    val sameLeft = Seq((10L, "p", "a"), (9L, "p", "b"), (8L, "p", "c"))
    assert(Bpe.selectBatch(sameLeft, truncated = false, maxRules = 10) ==
      sameLeft)
    // ...but the count-interference directions block: (x,a) after (a,b)
    // (right = accepted left, count decreases) and (b,y) after (a,b)
    // (left = accepted right, count decreases)
    assert(Bpe.selectBatch(Seq((10L, "a", "b"), (9L, "x", "a")),
      truncated = false, maxRules = 10) == Seq((10L, "a", "b")))
    assert(Bpe.selectBatch(Seq((10L, "a", "b"), (9L, "b", "y")),
      truncated = false, maxRules = 10) == Seq((10L, "a", "b")))
    // merged-string conflict: (a,bc) and (ab,c) both fuse to "abc"
    val fuse = Seq((10L, "a", "bc"), (9L, "ab", "c"), (8L, "x", "y"))
    assert(Bpe.selectBatch(fuse, truncated = false, maxRules = 10) ==
      Seq((10L, "a", "bc")))
    // truncation floor: unseen pairs may tie the last row's count, so
    // accepted pairs at that count are dropped
    val trunc = Seq((10L, "a", "b"), (8L, "c", "d"), (8L, "e", "f"))
    assert(Bpe.selectBatch(trunc, truncated = true, maxRules = 10) ==
      Seq((10L, "a", "b")))
    assert(Bpe.selectBatch(trunc, truncated = false, maxRules = 10) ==
      trunc)
    // self-pair: singleton if first, scan-stop otherwise
    assert(Bpe.selectBatch(Seq((10L, "x", "x"), (8L, "a", "b")),
      truncated = false, maxRules = 10) == Seq((10L, "x", "x")))
    assert(Bpe.selectBatch(
      Seq((10L, "a", "b"), (9L, "x", "x"), (8L, "c", "d")),
      truncated = false, maxRules = 10) == Seq((10L, "a", "b")))
    // collision with a PREVIOUS iteration's merged symbol: singleton if
    // top (sequential semantics conflate, a singleton is the sequential
    // step); blocked otherwise
    val known = Set("ab")
    assert(Bpe.selectBatch(Seq((10L, "a", "b"), (8L, "c", "d")),
      truncated = false, maxRules = 10, known) == Seq((10L, "a", "b")))
    assert(Bpe.selectBatch(
      Seq((10L, "c", "d"), (9L, "a", "b"), (7L, "e", "f")),
      truncated = false, maxRules = 10, known) == Seq((10L, "c", "d")))
    // maxRules cap folds the first over-cap count into the bound: at
    // counts (10,8,5) both kept survive the 5-bound; at (10,8,8) the
    // over-cap 8 ties the second accepted pair and strictness drops it
    assert(Bpe.selectBatch(disjoint, truncated = false, maxRules = 2) ==
      disjoint.take(2))
    assert(Bpe.selectBatch(Seq((10L, "a", "b"), (8L, "c", "d"),
      (8L, "e", "f")), truncated = false, maxRules = 2)
      == Seq((10L, "a", "b")))
  }

  test("diacritic words are in-vocabulary (Unicode-letter pre-tokenizer)" +
      " and merge identically to the reference") {
    import spark.implicits._
    val corpus = Seq(
      "žluťoučký kůň úpěl ďábelské ódy kůň kůň žluťoučký",
      "příliš žluťoučký kůň úpěl ódy ódy", "šíleně šíleně kůň")
    val df = corpus.toDF("text")
    val model = Bpe.learnMerges(df, "text", numMerges = 8)
    val vws = model.vocab.select("w").collect().map(_.getString(0)).toSet
    assert(vws.contains("kůň") && vws.contains("žluťoučký"), vws.toString)
    val want = refMerges(refWordCounts(corpus), 8)
    assert(model.merges.map(r => (r.left, r.right, r.pairCount)) == want)
    CacheRegistry.drain()
  }

  test("encodeCounts equals applying the reference merges word-by-word") {
    import spark.implicits._
    val corpus = randomCorpus(99, 40)
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 10)
    // reference final symbol count per word
    val wc = refWordCounts(corpus)
    var vocab: Map[String, Vector[String]] = wc.keysIterator
      .map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    refMerges(wc, 10).foreach { case (a, b, _) =>
      vocab = vocab.map { case (w, syms) =>
        val r = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            r += (a + b); i += 2
          } else { r += syms(i); i += 1 }
        }
        w -> r.result()
      }
    }
    val want = corpus.zipWithIndex.map { case (t, i) =>
      val ws = t.split(" ").filter(vocab.contains)
      (i.toLong, ws.length.toLong, ws.map(w => vocab(w).length.toLong).sum)
    }.filter(_._2 > 0).sortBy(_._1)
    val got = Bpe.encodeCounts(df, "doc_id", "text", model)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    CacheRegistry.drain()
  }

  /** Reference symbol→id assignment: base alphabet (distinct word chars
    * + `</w>`) sorted, then merged strings in rank order, first
    * assignment winning on collision — the [[Bpe.symbolTable]] contract.
    */
  private def refSymbolTable(
      wc: Map[String, Long],
      merges: Seq[(String, String, Long)]): Map[String, Int] = {
    val base = (wc.keysIterator.flatMap(_.map(_.toString)).toSet + "</w>")
      .toSeq.sorted
    val tab = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    base.foreach(s => tab(s) = tab.size)
    merges.foreach { case (a, b, _) =>
      val m = a + b
      if (!tab.contains(m)) tab(m) = tab.size
    }
    tab.toMap
  }

  test("encodeIds emits the reference token-id sequence per document " +
      "(ascii and diacritic corpora)") {
    import spark.implicits._
    for (corpus <- Seq(
        randomCorpus(7, 40),
        Seq("žluťoučký kůň úpěl ďábelské ódy kůň kůň žluťoučký",
          "příliš žluťoučký kůň úpěl ódy ódy", "šíleně šíleně kůň"))) {
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val model = Bpe.learnMerges(df, "text", numMerges = 10)
      val wc = refWordCounts(corpus)
      val merges = refMerges(wc, 10)
      // reference final symbols per word (same replay as encodeCounts)
      var vocab: Map[String, Vector[String]] = wc.keysIterator
        .map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
      merges.foreach { case (a, b, _) =>
        vocab = vocab.map { case (w, syms) =>
          val r = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              r += (a + b); i += 2
            } else { r += syms(i); i += 1 }
          }
          w -> r.result()
        }
      }
      val ids = refSymbolTable(wc, merges)
      val want = corpus.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").filter(vocab.contains)
          .flatMap(w => vocab(w).map(ids)).toVector
      }.filter(_._2.nonEmpty).sortBy(_._1)
      val got = Bpe.encodeIds(df, "doc_id", "text", model)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Int](1).toVector).toSeq
      assert(got == want, s"\n got=$got\nwant=$want")
      CacheRegistry.drain()
    }
  }

  /** Reference merge-replay tokenizer: symbolize a word, apply each rule
    * once in rank order (leftmost non-overlapping), map through the
    * symbol table — None if any symbol is out-of-alphabet.
    */
  private def refApply(
      w: String, merges: Seq[(String, String, Long)],
      ids: Map[String, Int]): Option[Vector[Int]] = {
    var syms = w.map(_.toString).toVector :+ "</w>"
    merges.foreach { case (a, b, _) =>
      val r = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          r += (a + b); i += 2
        } else { r += syms(i); i += 1 }
      }
      syms = r.result()
    }
    if (syms.forall(ids.contains)) Some(syms.map(ids).toVector) else None
  }

  test("applyModel on the TRAINING corpus equals encodeIds exactly") {
    import spark.implicits._
    val corpus = randomCorpus(17, 50)
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 10)
    val want = Bpe.encodeIds(df, "doc_id", "text", model)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
    // rulesPerChunk below the rule count exercises the chunked replay
    for (chunk <- Seq(3, 64)) {
      val got = Bpe.applyModel(df, "doc_id", "text", model,
          rulesPerChunk = chunk)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
      assert(got == want, s"chunk=$chunk")
    }
    CacheRegistry.drain()
  }

  test("applyModel tokenizes UNSEEN words by merge replay — matches the " +
      "reference tokenizer, out-of-alphabet words are skipped") {
    import spark.implicits._
    val train = randomCorpus(23, 60)
    val model = Bpe.learnMerges(train.toDF("text"), "text", numMerges = 12)
    val wc = refWordCounts(train)
    val merges = refMerges(wc, 12)
    assert(model.merges.map(r => (r.left, r.right, r.pairCount)) == merges)
    val ids = refSymbolTable(wc, merges)
    // eval corpus: unseen words over the training alphabet (abc), the
    // training words' concatenations, and out-of-alphabet words (q, ř)
    // that must be skipped wholesale
    val eval = Seq(
      "abab babab aabb ccab bbbb a b c",
      "cab abq qqq řeka abcabc", // abq/qqq/řeka: out-of-alphabet
      "qq zz") // doc with NO tokenizable word: absent from the output
    val evalDf = eval.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val trainWords = wc.keySet
    val unseen = eval.flatMap(_.split(" "))
      .filter(w => w.matches("^\\p{L}+$") && !trainWords.contains(w))
    assert(unseen.nonEmpty, "eval corpus must actually contain unseen words")
    val want = eval.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split(" ")
        .filter(w => w.nonEmpty && w.matches("^\\p{L}+$") && w.length <= 32)
        .flatMap(w => refApply(w, merges, ids).toSeq)
        .flatten.toVector
    }.filter(_._2.nonEmpty)
    val got = Bpe.applyModel(evalDf, "doc_id", "text", model)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
    assert(got == want, s"\n got=$got\nwant=$want")
    CacheRegistry.drain()
  }

  test("applyModel under spark.graft.bpe.oov=unk emits ONE reserved " +
      "UNK id per untokenizable word — full word coverage, drop mode " +
      "is the subsequence with those words removed") {
    import spark.implicits._
    val train = randomCorpus(23, 60)
    val model = Bpe.learnMerges(train.toDF("text"), "text", numMerges = 12)
    val wc = refWordCounts(train)
    val merges = refMerges(wc, 12)
    val ids = refSymbolTable(wc, merges)
    val unk = Bpe.unkId(model)
    assert(unk == ids.size, "UNK must be one past the last symbol id")
    val eval = Seq(
      "abab babab aabb ccab bbbb a b c",
      "cab abq qqq řeka abcabc 123 a9", // out-of-alphabet AND non-letter
      "qq zz", // all-OOV doc: PRESENT under unk (two UNK tokens)
      "x".repeat(40) + " ab") // over-length word → UNK
    val evalDf = eval.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val want = eval.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split(" ").filter(_.nonEmpty).flatMap { w =>
        if (w.matches("^\\p{L}+$") && w.length <= 32)
          refApply(w, merges, ids).getOrElse(Vector(unk))
        else Vector(unk)
      }.toVector
    }.filter(_._2.nonEmpty)
    spark.conf.set(Bpe.OovModeConf, "unk")
    val got =
      try Bpe.applyModel(evalDf, "doc_id", "text", model)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
      finally spark.conf.unset(Bpe.OovModeConf)
    assert(got == want, s"\n got=$got\nwant=$want")
    // drop mode on the same corpus = unk output with UNK tokens erased
    // (and then-empty docs gone) — the two modes agree on every real id
    val dropped = Bpe.applyModel(evalDf, "doc_id", "text", model)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
    val erased = want.map { case (d, v) => d -> v.filter(_ != unk) }
      .filter(_._2.nonEmpty)
    assert(dropped == erased)
    CacheRegistry.drain()
  }

  test("applyModel under spark.graft.bpe.oov=bytes expands every " +
      "untokenizable word to its UTF-8 bytes on the reserved page — " +
      "including multi-byte and supplementary-plane characters") {
    import spark.implicits._
    val train = randomCorpus(23, 60)
    val model = Bpe.learnMerges(train.toDF("text"), "text", numMerges = 12)
    val wc = refWordCounts(train)
    val merges = refMerges(wc, 12)
    val ids = refSymbolTable(wc, merges)
    val base = Bpe.unkId(model) + 1 // bytes page starts ONE PAST UNK
    val eval = Seq(
      "abab babab qq a b c", // in-vocab + out-of-alphabet ascii
      "řeka čáp 123 a9", // 2-byte letters; digit words pre-tok-rejected
      "🙂 ok🙂go", // U+1F642 — 4-byte UTF-8, lone and embedded
      "x".repeat(40)) // over-length word → whole-word byte fallback
    val evalDf = eval.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def fb(w: String): Vector[Int] =
      w.getBytes("UTF-8").toVector.map(b => base + (b & 0xff))
    val want = eval.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split(" ").filter(_.nonEmpty).flatMap { w =>
        if (w.matches("^\\p{L}+$") && w.length <= 32)
          refApply(w, merges, ids).getOrElse(fb(w))
        else fb(w)
      }.toVector
    }
    spark.conf.set(Bpe.OovModeConf, "bytes")
    val got =
      try Bpe.applyModel(evalDf, "doc_id", "text", model)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
      finally spark.conf.unset(Bpe.OovModeConf)
    assert(got == want, s"\n got=$got\nwant=$want")
    // the supplementary-plane char must be true UTF-8 (F0 9F 99 82),
    // not CESU-8 surrogate halves — pin the exact bytes
    assert(got(2)._2.take(4) ==
      Vector(0xf0, 0x9f, 0x99, 0x82).map(base + _))
    CacheRegistry.drain()
  }

  test("decodeIds inverts the encoder exactly on the drop-mode domain; " +
      "reserved-page ids render as visible replacement characters") {
    import spark.implicits._
    val train = randomCorpus(23, 60)
    val model = Bpe.learnMerges(train.toDF("text"), "text", numMerges = 12)
    val eval = Seq(
      "abab babab aabb ccab a b c",
      "cab abq qqq 123 bbbb", // OOV + rejected words interleaved
      "qq zz") // all-OOV
    val evalDf = eval.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // drop mode: decode(applyModel(x)) == the admitted words rejoined
    val decoded = Bpe.decodeIds(
        Bpe.applyModel(evalDf, "doc_id", "text", model),
        "doc_id", "token_ids", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wc = refWordCounts(train)
    val merges = refMerges(wc, 12)
    val ids = refSymbolTable(wc, merges)
    val want = eval.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split(" ").filter(_.nonEmpty).filter { w =>
        w.matches("^\\p{L}+$") && w.length <= 32 &&
          refApply(w, merges, ids).isDefined
      }.mkString(" ")
    }.filter(_._2.nonEmpty).toMap
    assert(decoded == want, s"\n got=$decoded\nwant=$want")
    // unk mode: every OOV word decodes to ONE visible replacement char
    spark.conf.set(Bpe.OovModeConf, "unk")
    val unkDecoded =
      try Bpe.decodeIds(
          Bpe.applyModel(evalDf, "doc_id", "text", model),
          "doc_id", "token_ids", model)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      finally spark.conf.unset(Bpe.OovModeConf)
    // one UNK = one whole word in unk mode, so the boundary survives
    assert(unkDecoded(2L) == "� �", // "qq zz" → two spaced UNKs
      s"got ${unkDecoded(2L)}")
    CacheRegistry.drain()
  }

  test("decodeIds reassembles bytes-mode reserved-page runs back to " +
      "the original text — oov=bytes round-trips end to end, adjacent " +
      "OOV words fusing (a byte run carries no boundary marker)") {
    import spark.implicits._
    val train = randomCorpus(23, 60)
    val model = Bpe.learnMerges(train.toDF("text"), "text", numMerges = 12)
    val eval = Seq(
      "abab babab aabb a b c", // fully admitted
      "cab řeka čáp abab", // 2-byte OOV words between admitted ones
      "🙂 ok🙂go 123", // 4-byte supplementary plane + rejected word
      "qq zz abab") // adjacent ascii-OOV words: fuse
    val evalDf = eval.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    spark.conf.set(Bpe.OovModeConf, "bytes")
    val decoded =
      try Bpe.decodeIds(
          Bpe.applyModel(evalDf, "doc_id", "text", model),
          "doc_id", "token_ids", model)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      finally spark.conf.unset(Bpe.OovModeConf)
    val wc = refWordCounts(train)
    val merges = refMerges(wc, 12)
    val ids = refSymbolTable(wc, merges)
    def admitted(w: String) =
      w.matches("^\\p{L}+$") && w.length <= 32 &&
        refApply(w, merges, ids).isDefined
    // expected: words in order; an admitted word carries its boundary
    // space, an OOV word's byte run carries none — so OOV words fuse
    // with whatever follows, exactly as the scaladoc contracts
    val want = eval.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split(" ").filter(_.nonEmpty)
        .map(w => if (admitted(w)) w + " " else w)
        .mkString.stripSuffix(" ")
    }.toMap
    assert(decoded == want, s"\n got=$decoded\nwant=$want")
    CacheRegistry.drain()
  }

  test("symbolRows memo: the alphabet-derivation job runs ONCE per " +
      "model — later unkId calls are driver-side and symbolTable is a " +
      "local relation (zero Spark jobs)") {
    import spark.implicits._
    val model = Bpe.learnMerges(
      randomCorpus(23, 40).toDF("text"), "text", numMerges = 6)
    val first = Bpe.unkId(model) // pays the one derivation job
    Thread.sleep(300) // let in-flight listener events drain
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(Bpe.unkId(model) == first)
      val plan = Bpe.symbolTable(model).queryExecution.optimizedPlan
      assert(plan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        s"symbolTable should be a memo-backed local relation, got:\n$plan")
      Thread.sleep(300)
      assert(jobs == 0, s"expected 0 jobs after memoization, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    CacheRegistry.drain()
  }

  test("truncate(model, k) EXACTLY equals training at depth k — rules, " +
      "vocabulary, and encode output — at every depth, including the " +
      "degenerate ends") {
    import spark.implicits._
    val train = randomCorpus(29, 50)
    val df = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val full = Bpe.learnMerges(df, "text", numMerges = 12)
    for (k <- Seq(0, 1, 5, 12)) {
      val cut = Bpe.truncate(full, k)
      assert(cut.merges == full.merges.take(k), s"k=$k rules diverged")
      if (k > 0) {
        val direct = Bpe.learnMerges(df, "text", numMerges = k)
        assert(cut.merges == direct.merges, s"k=$k vs direct training")
        val vCut = cut.vocab.select("w", "cnt", "sym").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
        val vDir = direct.vocab.select("w", "cnt", "sym").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
        assert(vCut == vDir, s"k=$k vocabulary diverged")
        def enc(m: Bpe.Model) =
          Bpe.encodeIds(df, "doc_id", "text", m).orderBy("doc_id")
            .collect().map(r =>
              r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
        assert(enc(cut) == enc(direct), s"k=$k encode diverged")
      }
    }
    CacheRegistry.drain()
  }

  test("saveModel → loadModel round-trips the tokenizer: identical " +
      "rules, and the loaded model encodes seen AND unseen text " +
      "identically to the in-memory one") {
    import spark.implicits._
    val train = randomCorpus(31, 50)
    val df = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 8)
    val dir = java.nio.file.Files.createTempDirectory("bpe-model").toString
    Bpe.saveModel(model, dir)
    val loaded = Bpe.loadModel(spark, dir)
    assert(loaded.merges == model.merges)
    def enc(m: Bpe.Model, d: org.apache.spark.sql.DataFrame) =
      Bpe.encodeIds(d, "doc_id", "text", m).orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
    assert(enc(loaded, df) == enc(model, df))
    // unseen corpus through the loaded model — the cross-job lifecycle
    val eval = Seq((0L, "abab ccba bac"), (1L, "aabbcc ab"))
      .toDF("doc_id", "text")
    def app(m: Bpe.Model) =
      Bpe.applyModel(eval, "doc_id", "text", m).orderBy("doc_id")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toSeq
    assert(app(loaded) == app(model) && app(loaded).nonEmpty)
    // the persisted-format marker is present and current…
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    assert(meta.getLong(meta.fieldIndex("format_version"))
      == Bpe.FormatVersion.toLong)
    // …and a version mismatch refuses loudly instead of mis-decoding
    // (the oov byte-page base moved between formats)
    Seq((1L, "unk_id")).toDF("format_version", "oov_page_base")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val ex = intercept[IllegalArgumentException] {
      Bpe.loadModel(spark, dir)
    }
    assert(ex.getMessage.contains("format version 1"))
    // …and a meta dir that EXISTS but holds no rows (interrupted or
    // partial save) raises the same descriptive error, not a bare
    // NoSuchElementException from head()
    Seq((1L, "unk_id")).toDF("format_version", "oov_page_base")
      .filter(lit(false)).write.mode("overwrite").parquet(s"$dir/meta")
    val ex2 = intercept[IllegalArgumentException] {
      Bpe.loadModel(spark, dir)
    }
    assert(ex2.getMessage.contains("no readable format_version"),
      ex2.getMessage)
    CacheRegistry.drain()
  }

  test("encodeIds → sequenceOffsets is shard-invariant: global token " +
      "offsets identical at 1, 7, and 64 shards") {
    import spark.implicits._
    val corpus = randomCorpus(21, 60)
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 6)
    val enc = Bpe.encodeIds(df, "doc_id", "text", model)
      .select(col("doc_id"), size(col("token_ids")).cast("long").as("n"))
    val runs = Seq(1, 7, 64).map { sh =>
      Packing.sequenceOffsets(enc, "doc_id", "n", shards = sh)
        .select("doc_id", "offset").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(runs(0) == runs(1) && runs(1) == runs(2))
    // and the offsets are the true prefix sum of the id-ordered lengths
    val lens = enc.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = lens.scanLeft(0L)(_ + _._2).init
    assert(runs(0).map(_._2).sameElements(want))
    CacheRegistry.drain()
  }

  test("out-of-vocabulary tokens (digits, mixed alnum, over-length) " +
      "never enter the vocabulary and are skipped by encode") {
    import spark.implicits._
    val df = Seq((1L, "abc a1c 9 a9 " + "z" * 40 + " abc")).toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 3, maxWordLen = 32)
    val vws = model.vocab.select("w").collect().map(_.getString(0)).toSet
    assert(vws == Set("abc"))
    val enc = Bpe.encodeCounts(df, "doc_id", "text", model).collect()
    assert(enc.length == 1 && enc(0).getLong(1) == 2L)
    CacheRegistry.drain()
  }

  test("merge application is leftmost non-overlapping and the plan is " +
      "join/window-shaped (no cartesian, no global window)") {
    import spark.implicits._
    // "aaaa" under (a,a): leftmost gives [aa, aa, </w>] not [a, aa, a]
    val df = Seq.fill(5)("aaaa aaa").toDF("text")
    val model = Bpe.learnMerges(df, "text", numMerges = 2)
    // merge 1: (a,a) at 3·5 + 2·5 = 25; leftmost application gives
    // "aa aa </w>" / "aa a </w>" (never "a aa a"); merge 2 is a 4-way
    // tie at 5 broken lexicographically to (a, </w>)
    assert(model.merges(0) == Bpe.MergeRule(1, "a", "a", "aa", 25L),
      model.merges.toString)
    assert(model.merges(1) == Bpe.MergeRule(2, "a", "</w>", "a</w>", 5L),
      model.merges.toString)
    val syms = model.vocab.filter(col("w") === "aaaa")
      .select("sym").collect()(0).getString(0)
    val syms3 = model.vocab.filter(col("w") === "aaa")
      .select("sym").collect()(0).getString(0)
    assert(syms == "aa aa </w>" && syms3 == "aa a</w>",
      s"aaaa=$syms aaa=$syms3")
    val plan = model.vocab.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    CacheRegistry.drain()
  }
}
