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
      .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
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

  test("out-of-vocabulary tokens (uppercase, digits, over-length) never " +
      "enter the vocabulary and are skipped by encode") {
    import spark.implicits._
    val df = Seq((1L, "abc ABC a1 " + "z" * 40 + " abc")).toDF("doc_id", "text")
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
