package graft.streaming

import graft.SparkSpec
import graft.operators.{Bpe, CacheRegistry, TextAnalysis}
import graft.sources.WarcReader
import org.apache.spark.sql.functions._

class CorpusStreamSpec extends SparkSpec {

  private def htmlRec(i: Int, bodyText: String): WarcReader.WarcRecord =
    WarcReader.WarcRecord("response", s"https://x.example/p/$i",
      "2026-01-01T00:00:00Z", 200, "text/html",
      (s"<html><head><style>p{color:red}</style></head>" +
        s"<body><!-- c --><p>$bodyText</p></body></html>")
        .getBytes("UTF-8"))

  test("WARC stream → htmlToText → incremental dedup → applyModel: " +
      "segment 2 appends ONLY its novel docs; token ids match the batch " +
      "path on the union") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpus-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("corpus-ckpt")
    val out = java.nio.file.Files.createTempDirectory("corpus-out")
    // tokenizer trained OFFLINE, before any segment lands — the
    // train-once / apply-at-ingest lifecycle
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)

    def drain(): Unit = {
      val q = CorpusStream.run(spark, dir.toString, model,
        ckpt.toString, out.toString)
      q.awaitTermination()
    }
    def got(): Map[String, Vector[Int]] =
      spark.read.parquet(out.toString).collect()
        .map(r => r.getAs[String]("url") ->
          Option(r.getAs[scala.collection.Seq[Int]]("token_ids"))
            .map(_.toVector).orNull)
        .toMap

    // segment 1: two distinct documents
    val derivations0 = Bpe.symbolDerivations.get()
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, "ab ab bc"), htmlRec(2, "cc abab")),
        gzipPerRecord = true))
    drain()
    assert(got().keySet == Set("https://x.example/p/1",
      "https://x.example/p/2"))

    // segment 2: one novel doc, one cross-segment duplicate (same
    // extracted text as p/1 under a NEW url — must not re-emit), one
    // non-200 and one non-html record (filtered before extraction)
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(
        htmlRec(3, "cc ab a"),
        htmlRec(4, "ab ab bc"), // duplicate of p/1's text
        WarcReader.WarcRecord("response", "https://x.example/p/5",
          "2026-01-01T00:00:00Z", 404, "text/html",
          "<html><body><p>gone</p></body></html>".getBytes("UTF-8")),
        WarcReader.WarcRecord("response", "https://x.example/p/6",
          "2026-01-01T00:00:00Z", 200, "image/png",
          Array[Byte](1, 2, 3))), gzipPerRecord = true))
    drain()
    val streamed = got()
    assert(streamed.keySet == Set("https://x.example/p/1",
      "https://x.example/p/2", "https://x.example/p/3"),
      s"segment 2 must append exactly its novel doc: ${streamed.keySet}")

    // token-id parity with the batch path over the union of segments:
    // same filter + extraction, applyModel per url — ids depend only
    // on text, so every streamed row must match its batch twin
    val batchDocs = WarcReader.read(spark, dir.toString + "/*.warc*")
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri").as("url"),
        graft.operators.TextAnalysis.htmlToText(
          decode(col("body"), "UTF-8")).as("text"))
    val want = Bpe.applyModel(batchDocs, "url", "text", model)
      .collect().map(r => r.getAs[String]("url") ->
        r.getAs[scala.collection.Seq[Int]]("token_ids").toVector).toMap
    assert(streamed.nonEmpty)
    for ((url, ids) <- streamed)
      assert(ids == want(url), s"$url: stream=$ids batch=${want(url)}")
    // the symbol-table memo across the whole two-drain lifecycle (plus
    // the batch-path encode above): at most ONE derivation for this
    // model — pre-memo, every micro-batch re-ran it twice
    assert(Bpe.symbolDerivations.get() - derivations0 <= 1L,
      s"model derived ${Bpe.symbolDerivations.get() - derivations0} times")
    CacheRegistry.drain()
  }

  test("running CMS across drains: the merged per-batch sketches equal " +
      "the one-shot sketch of everything admitted, and a same-batchId " +
      "replay cannot double-count") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("cms-ckpt")
    val out = java.nio.file.Files.createTempDirectory("cms-out")
    val skd = java.nio.file.Files.createTempDirectory("cms-sketch")
    val model = Bpe.learnMerges(Seq("a b c ab").toDF("text"), "text", 2)
    def drain(): Unit = {
      val q = CorpusStream.run(spark, dir.toString, model,
        ckpt.toString, out.toString,
        sketchDir = skd.toString, sketchDepth = 3, sketchWidth = 16)
      q.awaitTermination()
    }
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, "alpha beta alpha"),
        htmlRec(2, "gamma beta")), gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(htmlRec(3, "alpha delta")),
        gzipPerRecord = true))
    drain()
    def sketchMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("row"),
        r.getAs[Long]("bucket")) -> r.getAs[Long]("c")).toMap
    val merged = sketchMap(
      CorpusStream.readCmsSketch(spark, skd.toString))
    val admitted = spark.read.parquet(out.toString)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val whole = sketchMap(
      graft.operators.Sketch.cmsSketch(admitted, "tok", 3, 16))
    assert(merged == whole,
      s"merged sketch must equal the one-shot sketch: $merged vs $whole")
    // crash-replay of batch 1: rewrite, not re-add
    val batch1 = spark.read.parquet(out.toString)
      .filter(col("batch_id") === 1L).select("url", "text")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    graft.operators.Sketch.cmsSketch(
        batch1.select(explode(TextAnalysis.tokens(col("text"))).as("tok")),
        "tok", 3, 16)
      .write.mode("overwrite").parquet(s"${skd.toString}/batch_id=1")
    val replayed = sketchMap(
      CorpusStream.readCmsSketch(spark, skd.toString))
    assert(replayed == whole, "replay overwrite must not double-count")
    CacheRegistry.drain()
  }

  test("telemetry lifecycle under compaction: CMS and KMV dirs " +
      "consolidate into RE-AGGREGATED coverage partitions (fixed sketch " +
      "size, not one row set per drain), merged reads equal one-shot " +
      "sketches, and a same-batchId replay cannot double-count") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tele-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("tele-ckpt")
    val out = java.nio.file.Files.createTempDirectory("tele-out")
    val skd = java.nio.file.Files.createTempDirectory("tele-cms")
    val kvd = java.nio.file.Files.createTempDirectory("tele-kmv")
    val model = Bpe.learnMerges(Seq("a b c ab").toDF("text"), "text", 2)
    val kmvK = 8
    def drain(): Unit = {
      val q = CorpusStream.run(spark, dir.toString, model,
        ckpt.toString, out.toString,
        sketchDir = skd.toString, sketchDepth = 3, sketchWidth = 16,
        kmvDir = kvd.toString, kmvK = kmvK, compactEvery = 1)
      q.awaitTermination()
    }
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, "alpha beta alpha gamma"),
        htmlRec(2, "gamma beta epsilon")), gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(htmlRec(3, "alpha delta zeta eta theta")),
        gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00003.warc.gz"),
      WarcReader.write(Seq(htmlRec(4, "iota kappa lambda mu nu xi")),
        gzipPerRecord = true))
    drain()

    def partitions(d: java.nio.file.Path): Seq[Long] =
      new java.io.File(d.toString).listFiles.toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName.stripPrefix("batch_id=").toLong).sorted
    // drain 2 compacted batches 0 and 1 of EVERY layout into a
    // negative coverage partition; batch 2 (still replayable) remains
    for (d <- Seq(out, skd, kvd))
      assert(partitions(d) == Seq(-3L, 2L), s"$d: ${partitions(d)}")
    // the CMS coverage partition holds a re-summed sketch (bounded by
    // depth*width), and the KMV coverage partition ONE merged row —
    // not one row set per covered drain
    assert(spark.read.parquet(s"$skd/batch_id=-3")
      .groupBy("row", "bucket").count().filter(col("count") > 1)
      .isEmpty, "CMS coverage partition must be re-summed")
    assert(spark.read.parquet(s"$kvd/batch_id=-3").count() == 1L,
      "KMV coverage partition must be one merged row per group")

    val admitted = spark.read.parquet(out.toString)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    def cmsMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("row"),
        r.getAs[Long]("bucket")) -> r.getAs[Long]("c")).toMap
    assert(cmsMap(CorpusStream.readCmsSketch(spark, skd.toString)) ==
      cmsMap(graft.operators.Sketch.cmsSketch(admitted, "tok", 3, 16)),
      "merged CMS must equal the one-shot sketch of everything admitted")
    def kmvOf(df: org.apache.spark.sql.DataFrame): Vector[Long] =
      df.collect().map(_.getAs[scala.collection.Seq[Long]]("kmv").toVector)
        .head
    val mergedKmv = kmvOf(
      CorpusStream.readKmvSketch(spark, kvd.toString, kmvK))
    val oneShot = kmvOf(graft.operators.Sketch.kmvSketch(
      admitted.select(lit("all").as("g"), col("tok")), "g", "tok", kmvK))
    assert(mergedKmv == oneShot,
      s"merged KMV must equal one-shot: $mergedKmv vs $oneShot")
    assert(mergedKmv.length == kmvK,
      s"k must bind (need > $kmvK distinct tokens): ${mergedKmv.length}")

    // crash-replay of the still-live batch 2: overwrite its telemetry
    // partitions from its own rows — reads must be unchanged
    val batch2 = spark.read.parquet(out.toString)
      .filter(col("batch_id") === 2L)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    graft.operators.Sketch.cmsSketch(batch2, "tok", 3, 16)
      .write.mode("overwrite").parquet(s"$skd/batch_id=2")
    graft.operators.Sketch.kmvSketch(
        batch2.select(lit("all").as("g"), col("tok")), "g", "tok", kmvK)
      .write.mode("overwrite").parquet(s"$kvd/batch_id=2")
    assert(cmsMap(CorpusStream.readCmsSketch(spark, skd.toString)) ==
      cmsMap(graft.operators.Sketch.cmsSketch(admitted, "tok", 3, 16)),
      "CMS replay overwrite must not double-count")
    assert(kmvOf(CorpusStream.readKmvSketch(spark, kvd.toString, kmvK))
      == oneShot, "KMV replay overwrite must not double-count")
    CacheRegistry.drain()
  }

  test("per-drain dup-mass telemetry: each drain writes its own q185 " +
      "histogram keyed by a compaction-stable drain_batch column, the " +
      "rows equal a direct batch-read recomputation for EVERY drain " +
      "even after compaction consolidates the partitions, and a " +
      "same-batchId replay overwrite changes nothing") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dm-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("dm-ckpt")
    val out = java.nio.file.Files.createTempDirectory("dm-out")
    val dmd = java.nio.file.Files.createTempDirectory("dm-tele")
    val model = Bpe.learnMerges(Seq("a b c ab").toDF("text"), "text", 2)
    def drain(): Unit = {
      val q = CorpusStream.run(spark, dir.toString, model,
        ckpt.toString, out.toString,
        dupMassDir = dmd.toString, dupMassShingleN = 3,
        dupMassThreshold = 0.7, compactEvery = 1)
      q.awaitTermination()
    }
    // drain 0: a 10-token page, its 2-token-extended near-dup (shares
    // 8 of 10 shingles -> jaccard 0.8 >= 0.7), and one singleton
    val baseText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, baseText),
        htmlRec(2, baseText + " alpha beta"),
        htmlRec(3, "unrelated totally different words here")),
        gzipPerRecord = true))
    drain()
    // drain 1: singletons only
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(htmlRec(4, "lambda mu nu xi omicron pi")),
        gzipPerRecord = true))
    drain()
    // drain 2: two exact-shingle clones again (within-drain cluster)
    java.nio.file.Files.write(dir.resolve("seg-00003.warc.gz"),
      WarcReader.write(Seq(htmlRec(5, "rho sigma tau upsilon phi chi psi"),
        htmlRec(6, "rho sigma tau upsilon phi chi psi omega extra")),
        gzipPerRecord = true))
    drain()

    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("drain_batch"),
        r.getAs[Long]("size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("doc_mass"), r.getAs[Long]("removable"))).toSet
    val tele = rowsOf(CorpusStream.readDupMassTelemetry(spark, dmd.toString))
    // drain 0: one 2-cluster + one singleton; drain 1: one singleton;
    // drain 2: one 2-cluster and an explicit ZERO singleton row (the
    // histogram always carries its size-1 row — "no singletons" is a
    // reading, not an absence)
    assert(tele == Set(
      (0L, 2L, 1L, 2L, 1L), (0L, 1L, 1L, 1L, 0L),
      (1L, 1L, 1L, 1L, 0L),
      (2L, 2L, 1L, 2L, 1L), (2L, 1L, 0L, 0L, 0L)), tele.toString)
    // compaction consolidated drains 0 and 1 (compactEvery=1, 3 drains
    // -> coverage partition -3 plus live batch 2), yet every drain's
    // rows above survived bit-identical via the drain_batch DATA column
    val parts = new java.io.File(dmd.toString).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).sorted
    assert(parts == Seq(-3L, 2L), parts.toString)
    // merged-equals-batch-read: every drain's telemetry equals the
    // q185 histogram recomputed directly from that drain's PLANTED
    // docs (drains 0/1's corpus partitions were consolidated into the
    // coverage partition — partition ids don't survive compaction,
    // which is exactly why the telemetry carries drain_batch as data)
    val planted = Map(
      0L -> Seq(baseText, baseText + " alpha beta",
        "unrelated totally different words here"),
      1L -> Seq("lambda mu nu xi omicron pi"),
      2L -> Seq("rho sigma tau upsilon phi chi psi",
        "rho sigma tau upsilon phi chi psi omega extra"))
    for ((b, texts) <- planted) {
      val direct = graft.operators.Dedup.dupMassHistogram(
          texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_key", "text"),
          "doc_key", "text", 3, 0.7)
        .withColumn("drain_batch", lit(b))
      assert(rowsOf(direct) == tele.filter(_._1 == b),
        s"drain $b: telemetry diverged from the batch read")
    }
    // crash-replay of the still-live batch 2: overwrite its partition
    // from its own corpus rows — the read must be unchanged (same
    // shifted-hash doc key as the stream's own write)
    val batch2 = spark.read.parquet(out.toString)
      .filter(col("batch_id") === 2L)
      .select(shiftrightunsigned(xxhash64(col("url")), 1).as("doc_key"),
        col("text"))
    graft.operators.Dedup.dupMassHistogram(batch2, "doc_key", "text",
        3, 0.7)
      .withColumn("drain_batch", lit(2L))
      .write.mode("overwrite").parquet(s"$dmd/batch_id=2")
    assert(rowsOf(CorpusStream.readDupMassTelemetry(spark, dmd.toString))
      == tele, "replay overwrite must not change the telemetry")
    CacheRegistry.drain()
  }

  test("runFuzzy: a NEAR-duplicate re-crawl (small edit, new exact " +
      "fingerprint) is suppressed by the persisted band-key index; " +
      "novel docs still land") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fuzzy-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("fuzzy-ckpt")
    val out = java.nio.file.Files.createTempDirectory("fuzzy-out")
    val bidx = java.nio.file.Files.createTempDirectory("fuzzy-bidx")
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    def drain(): Unit = {
      val q = CorpusStream.runFuzzy(spark, dir.toString, model,
        ckpt.toString, out.toString, bidx.toString)
      q.awaitTermination()
    }
    def urls(): Set[String] =
      spark.read.parquet(out.toString).select("url").collect()
        .map(_.getString(0)).toSet

    val longText = (1 to 20).map(k => s"ab token$k").mkString(" ")
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, longText)), gzipPerRecord = true))
    drain()
    assert(urls() == Set("https://x.example/p/1"))
    // the index now holds p/1's band keys
    assert(spark.read.parquet(bidx.toString).count() == 16L)

    // segment 2: p/2 is p/1 with the LAST WORD dropped — different
    // exact fingerprint (passes the checkpointed dropDuplicates), but
    // a MinHash band collides → suppressed by the fuzzy gate; p/3 is
    // genuinely new text and must land
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(
        htmlRec(2, longText.split(" ").dropRight(1).mkString(" ")),
        htmlRec(3, (1 to 20).map(k => s"cc other$k").mkString(" "))),
        gzipPerRecord = true))
    drain()
    assert(urls() == Set("https://x.example/p/1", "https://x.example/p/3"),
      s"near-dup re-crawl must be suppressed: ${urls()}")
    // the index grew by exactly the admitted doc's keys
    assert(spark.read.parquet(bidx.toString).count() == 32L)

    // segment 3: the SAME url p/1 re-crawled with a small edit — a new
    // exact fingerprint (passes dropDuplicates), and because the band
    // index is keyed by CONTENT fingerprint (not url), p/1's old keys
    // belong to a different fp and suppress the edit like any other
    // near-dup (url-keyed, its own keys would have exempted it)
    java.nio.file.Files.write(dir.resolve("seg-00003.warc.gz"),
      WarcReader.write(Seq(
        htmlRec(1, longText.split(" ").drop(1).mkString(" "))),
        gzipPerRecord = true))
    drain()
    assert(urls() == Set("https://x.example/p/1", "https://x.example/p/3"),
      s"same-url edited re-crawl must be suppressed: ${urls()}")
    assert(spark.read.parquet(bidx.toString).count() == 32L)
    assert(spark.read.parquet(out.toString).count() == 2L)
    CacheRegistry.drain()
  }

  test("crash-replay idempotence: re-executing a micro-batch with the " +
      "SAME batchId (foreachBatch's at-least-once contract) rewrites " +
      "its batch_id partitions instead of appending duplicates — " +
      "output AND band index stay exact, and a later batch still " +
      "gates against the earlier keys") {
    val session = spark
    import session.implicits._
    val out = java.nio.file.Files.createTempDirectory("replay-out")
    val bidx = java.nio.file.Files.createTempDirectory("replay-bidx")
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    val longText = (1 to 20).map(k => s"ab token$k").mkString(" ")
    val otherText = (1 to 20).map(k => s"cc other$k").mkString(" ")
    def docsDf(rows: (String, String)*) =
      rows.toSeq.toDF("url", "text").withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
    def exec(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      CorpusStream.fuzzyBatch(spark, model, out.toString, bidx.toString,
        3, 64, 16)(batch, id)
    def snapshot(): (Seq[(String, String)], Long) = (
      spark.read.parquet(out.toString).collect()
        .map(r => (r.getAs[String]("url"),
          r.getAs[scala.collection.Seq[Int]]("token_ids").mkString(",")))
        .sortBy(x => (x._1, x._2)).toSeq,
      spark.read.parquet(bidx.toString).count())

    val b0 = docsDf("https://x.example/p/1" -> longText,
      "https://x.example/p/2" -> otherText)
    exec(b0, 0L)
    val (rows0, idx0) = snapshot()
    assert(rows0.map(_._1).toSet ==
      Set("https://x.example/p/1", "https://x.example/p/2") && idx0 == 32L)
    // the crash window: index and output writes landed, the commit did
    // not — foreachBatch re-executes with the same batchId and data
    exec(b0, 0L)
    val (rows1, idx1) = snapshot()
    assert(rows1 == rows0,
      s"replay must not duplicate or change rows:\n$rows1\nvs\n$rows0")
    assert(idx1 == idx0, "replay must not grow the band index")
    // and a LATER batch still sees batch 0's keys: a near-dup of p/1
    // is suppressed, a novel doc lands in its own partition
    val b1 = docsDf(
      "https://x.example/p/9" ->
        longText.split(" ").dropRight(1).mkString(" "),
      "https://x.example/p/3" -> (1 to 20).map(k => s"bc new$k")
        .mkString(" "))
    exec(b1, 1L)
    val (rows2, idx2) = snapshot()
    assert(rows2.map(_._1).toSet == Set("https://x.example/p/1",
      "https://x.example/p/2", "https://x.example/p/3"), s"$rows2")
    assert(idx2 == 48L)
    CacheRegistry.drain()
  }

  test("runCurated: the composed quality chain runs in the stream — " +
      "pages failing the C4/Gopher gates never land, survivors " +
      "tokenize like the batch chain, and a replayed batch rewrites " +
      "its partition") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curated-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("curated-ckpt")
    val out = java.nio.file.Files.createTempDirectory("curated-out")
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    def para(s: String) = s"<p>$s</p>"
    def rec(i: Int, paras: String*): WarcReader.WarcRecord =
      WarcReader.WarcRecord("response", s"https://x.example/p/$i",
        "2026-01-01T00:00:00Z", 200, "text/html",
        (s"<html><body>${paras.map(para).mkString}</body></html>")
          .getBytes("UTF-8"))
    // a long proper sentence built from model-adjacent words so the
    // Gopher word-count and stopword gates can pass (minWords=12 below)
    val good = (1 to 6).map(k => s"abab the bc$k cc").mkString(" ") + "."
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(
        // survivor: 3 proper sentences, enough words, has stopwords
        rec(1, good, "Here is the second proper sentence now.",
          "And here is the third proper sentence."),
        // killed by C4's page gate: a lorem-ipsum tell
        rec(2, good, "Here is the second proper sentence now.",
          "Lorem ipsum dolor sit amet consectetur adipiscing elit."),
        // killed by C4's 3-kept-lines minimum: one real sentence
        rec(3, good),
        // killed by Gopher: enough lines but too few words
        rec(4, "Tiny one here.", "Tiny two here.", "Tiny three here.")),
        gzipPerRecord = true))
    CorpusStream.runCurated(spark, dir.toString, model,
        ckpt.toString, out.toString, minWords = 12, minStopKinds = 1)
      .awaitTermination()
    val rows = spark.read.parquet(out.toString).collect()
      .map(r => r.getAs[String]("url") ->
        r.getAs[scala.collection.Seq[Int]]("token_ids").toVector).toMap
    assert(rows.keySet == Set("https://x.example/p/1"), s"${rows.keySet}")
    // token ids equal the batch chain over the same cleaned text
    val cleanedText = Seq(good, "Here is the second proper sentence now.",
      "And here is the third proper sentence.").mkString("\n")
    val want = Bpe.applyModel(
        Seq(("u", cleanedText)).toDF("url", "text"), "url", "text", model)
      .collect().head.getAs[scala.collection.Seq[Int]](1).toVector
    assert(rows("https://x.example/p/1") == want)
    // at-least-once replay: re-execute the batch body with the same id
    val docs = Seq(("https://x.example/p/1", cleanedText))
      .toDF("url", "text")
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(org.apache.spark.sql
          .functions.col("text")))
    CorpusStream.curatedBatch(spark, model, out.toString, 12, 1)(docs, 0L)
    val again = spark.read.parquet(out.toString).collect()
    assert(again.length == 1, s"replay duplicated rows: ${again.length}")
    CacheRegistry.drain()
  }

  test("curated drain dup-mass telemetry: the histogram covers the " +
      "ADMITTED docs (post-gate — the drain's actual contribution), " +
      "equals a direct recomputation over the written partition, and " +
      "clusters a pair of near-dup survivors") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdm-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("cdm-ckpt")
    val out = java.nio.file.Files.createTempDirectory("cdm-out")
    val dmd = java.nio.file.Files.createTempDirectory("cdm-tele")
    val model = Bpe.learnMerges(Seq("a b ab").toDF("text"), "text", 2)
    def rec(i: Int, paras: String*): WarcReader.WarcRecord =
      WarcReader.WarcRecord("response", s"https://x.example/p/$i",
        "2026-01-01T00:00:00Z", 200, "text/html",
        (s"<html><body>${paras.map(p => s"<p>$p</p>").mkString}" +
          "</body></html>").getBytes("UTF-8"))
    val s1 = "The first proper sentence has enough words to pass here."
    val s2 = "Here is the second proper sentence with more words now."
    val s3 = "And here is the third proper sentence closing the page."
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(
        // two near-dup SURVIVORS: same three sentences, one page adds
        // a fourth short-but-proper line (different fp, shared
        // shingle mass at jaccard >= 0.7)
        rec(1, s1, s2, s3),
        rec(2, s1, s2, s3, "One more proper closing sentence here."),
        // a gate-killed page must NOT appear in the telemetry: the
        // lorem tell kills it even though it near-dups page 1
        rec(3, s1, s2, s3,
          "Lorem ipsum dolor sit amet consectetur adipiscing elit.")),
        gzipPerRecord = true))
    CorpusStream.runCurated(spark, dir.toString, model,
        ckpt.toString, out.toString, minWords = 12, minStopKinds = 1,
        dupMassDir = dmd.toString)
      .awaitTermination()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("drain_batch"),
        r.getAs[Long]("size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("doc_mass"), r.getAs[Long]("removable"))).toSet
    val tele = rowsOf(CorpusStream.readDupMassTelemetry(spark, dmd.toString))
    // pages 1+2 cluster; page 3 was gated out BEFORE the telemetry, so
    // the histogram reads 1 cluster of 2 and zero singletons
    assert(tele == Set((0L, 2L, 1L, 2L, 1L), (0L, 1L, 0L, 0L, 0L)),
      tele.toString)
    // merged-equals-batch-read over the ADMITTED (written) partition
    val admitted = spark.read.parquet(out.toString)
      .filter(col("batch_id") === 0L)
      .select(shiftrightunsigned(xxhash64(col("url")), 1).as("doc_key"),
        col("text"))
    assert(admitted.count() == 2L)
    val direct = graft.operators.Dedup.dupMassHistogram(
        admitted, "doc_key", "text", 3, 0.7)
      .withColumn("drain_batch", lit(0L))
    assert(rowsOf(direct) == tele,
      "telemetry must equal the batch read over the written partition")
    CacheRegistry.drain()
  }

  test("fuzzy drain dup-mass telemetry: gate-killed near-dups never " +
      "reach the histogram (ADMITTED-docs semantics), every drain's " +
      "rows equal a batch recompute over its admitted docs even after " +
      "compaction, and a drain whose bands catch everything reads " +
      "all-singleton") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fdm-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("fdm-ckpt")
    val out = java.nio.file.Files.createTempDirectory("fdm-out")
    val bidx = java.nio.file.Files.createTempDirectory("fdm-bidx")
    val dmd = java.nio.file.Files.createTempDirectory("fdm-tele")
    val model = Bpe.learnMerges(Seq("a b ab").toDF("text"), "text", 2)
    def drain(): Unit =
      CorpusStream.runFuzzy(spark, dir.toString, model, ckpt.toString,
          out.toString, bidx.toString, compactEvery = 1,
          dupMassDir = dmd.toString)
        .awaitTermination()
    val longA = (1 to 20).map(k => s"ab token$k").mkString(" ")
    val longB = (1 to 20).map(k => s"cc other$k").mkString(" ")
    val longC = (1 to 20).map(k => s"dd third$k").mkString(" ")
    val pairX = (1 to 20).map(k => s"ee fourth$k").mkString(" ")
    // drain 0: two unrelated docs, both admitted
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, longA), htmlRec(2, longB)),
        gzipPerRecord = true))
    drain()
    // drain 1: a near-dup re-crawl of longA (last word dropped — new
    // exact fp, suppressed by the persisted band index) plus one
    // genuinely new doc: only the new doc may reach the telemetry
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(
        htmlRec(3, longA.split(" ").dropRight(1).mkString(" ")),
        htmlRec(4, longC)), gzipPerRecord = true))
    drain()
    // drain 2: a WITHIN-drain near-dup pair — the batch-side band
    // collision admits exactly one, so the telemetry reads singleton
    java.nio.file.Files.write(dir.resolve("seg-00003.warc.gz"),
      WarcReader.write(Seq(htmlRec(5, pairX),
        htmlRec(6, pairX.split(" ").dropRight(1).mkString(" "))),
        gzipPerRecord = true))
    drain()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("drain_batch"),
        r.getAs[Long]("size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("doc_mass"), r.getAs[Long]("removable"))).toSet
    val tele = rowsOf(CorpusStream.readDupMassTelemetry(spark, dmd.toString))
    // ADMITTED-docs pin: drain 1's histogram is ONE singleton — had
    // the gate-killed near-dup leaked into the telemetry, the size-1
    // row would read 2 docs; drain 2's within-drain pair collapsed to
    // one admitted doc, so its residual read is all-singleton too
    assert(tele == Set(
      (0L, 1L, 2L, 2L, 0L),
      (1L, 1L, 1L, 1L, 0L),
      (2L, 1L, 1L, 1L, 0L)), tele.toString)
    // compaction consolidated drains 0/1 (compactEvery=1), and the
    // per-drain reads above survived via the drain_batch DATA column
    val parts = new java.io.File(dmd.toString).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).sorted
    assert(parts == Seq(-3L, 2L), parts.toString)
    // merged-equals-batch-recompute: each drain's telemetry equals the
    // q185 histogram over its ADMITTED (url, text) rows — recovered
    // from the corpus by the drain's planted urls, since compaction
    // already dissolved the corpus's own batch partitions
    val corpus = spark.read.parquet(out.toString)
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val drainUrls = Map(
      0L -> Seq("https://x.example/p/1", "https://x.example/p/2"),
      1L -> Seq("https://x.example/p/3", "https://x.example/p/4"),
      2L -> Seq("https://x.example/p/5", "https://x.example/p/6"))
    for ((b, urls) <- drainUrls) {
      val admitted = urls.flatMap(u => corpus.get(u).map(u -> _))
      val direct = graft.operators.Dedup.dupMassHistogram(
          admitted.toDF("url", "text")
            .select(shiftrightunsigned(xxhash64(col("url")), 1)
              .as("doc_key"), col("text")),
          "doc_key", "text", 3, 0.7)
        .withColumn("drain_batch", lit(b))
      assert(rowsOf(direct) == tele.filter(_._1 == b),
        s"drain $b: telemetry diverged from the admitted-docs recompute")
    }
    CacheRegistry.drain()
  }

  test("chunked drain dup-mass telemetry: the histogram covers the " +
      "drain's documents (storage-side chunk dedup is a different " +
      "axis), every drain equals a batch recompute after compaction, " +
      "and a replay overwrite changes nothing") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kdm-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("kdm-ckpt")
    val man = java.nio.file.Files.createTempDirectory("kdm-manifest")
    val store = java.nio.file.Files.createTempDirectory("kdm-store")
    val dmd = java.nio.file.Files.createTempDirectory("kdm-tele")
    def drain(): Unit =
      CorpusStream.runChunked(spark, dir.toString, ckpt.toString,
          man.toString, store.toString, divisor = 4, compactEvery = 1,
          dupMassDir = dmd.toString)
        .awaitTermination()
    val aTxt = (1 to 60).map(i => s"a$i").mkString(" ")
    val cTxt = (1 to 30).map(i => s"c$i").mkString(" ")
    val dTxt = (1 to 40).map(i => s"d$i").mkString(" ")
    val eTxt = (1 to 25).map(i => s"e$i").mkString(" ")
    // drain 0: a near-dup PAIR (prepended re-crawl — runChunked has no
    // near-dup gate, both land; the chunk store dedups their shared
    // chunks, but the DOCUMENT histogram must still read the cluster)
    // plus one unrelated doc
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, aTxt), htmlRec(2, "XX " + aTxt),
        htmlRec(3, cTxt)), gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(htmlRec(4, dTxt)), gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00003.warc.gz"),
      WarcReader.write(Seq(htmlRec(5, eTxt)), gzipPerRecord = true))
    drain()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("drain_batch"),
        r.getAs[Long]("size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("doc_mass"), r.getAs[Long]("removable"))).toSet
    val tele = rowsOf(CorpusStream.readDupMassTelemetry(spark, dmd.toString))
    assert(tele == Set(
      (0L, 2L, 1L, 2L, 1L), (0L, 1L, 1L, 1L, 0L),
      (1L, 1L, 1L, 1L, 0L),
      (2L, 1L, 1L, 1L, 0L)), tele.toString)
    // compaction consolidated drains 0/1; per-drain reads survive via
    // the drain_batch data column
    val parts = new java.io.File(dmd.toString).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).sorted
    assert(parts == Seq(-3L, 2L), parts.toString)
    val planted = Map(
      0L -> Seq("https://x.example/p/1" -> aTxt,
        "https://x.example/p/2" -> ("XX " + aTxt),
        "https://x.example/p/3" -> cTxt),
      1L -> Seq("https://x.example/p/4" -> dTxt),
      2L -> Seq("https://x.example/p/5" -> eTxt))
    for ((b, docs0) <- planted) {
      val direct = graft.operators.Dedup.dupMassHistogram(
          docs0.toDF("url", "text")
            .select(shiftrightunsigned(xxhash64(col("url")), 1)
              .as("doc_key"), col("text")),
          "doc_key", "text", 3, 0.7)
        .withColumn("drain_batch", lit(b))
      assert(rowsOf(direct) == tele.filter(_._1 == b),
        s"drain $b: telemetry diverged from the batch recompute")
    }
    // crash-replay of the still-live drain 2: overwrite its partition
    // from the same planted docs — the read must be unchanged
    graft.operators.Dedup.dupMassHistogram(
        planted(2L).toDF("url", "text")
          .select(shiftrightunsigned(xxhash64(col("url")), 1)
            .as("doc_key"), col("text")),
        "doc_key", "text", 3, 0.7)
      .withColumn("drain_batch", lit(2L))
      .write.mode("overwrite").parquet(s"$dmd/batch_id=2")
    assert(rowsOf(CorpusStream.readDupMassTelemetry(spark, dmd.toString))
      == tele, "replay overwrite must not change the telemetry")
    CacheRegistry.drain()
  }

  test("curated drain token-sketch telemetry: CMS and KMV cover the " +
      "ADMITTED (post-gate) docs, and the merged per-drain sketches " +
      "equal one-shot sketches over the written corpus even after the " +
      "re-aggregating compaction") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csk-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("csk-ckpt")
    val out = java.nio.file.Files.createTempDirectory("csk-out")
    val skd = java.nio.file.Files.createTempDirectory("csk-sketch")
    val kvd = java.nio.file.Files.createTempDirectory("csk-kmv")
    val model = Bpe.learnMerges(Seq("a b ab").toDF("text"), "text", 2)
    def rec(i: Int, paras: String*): WarcReader.WarcRecord =
      WarcReader.WarcRecord("response", s"https://x.example/p/$i",
        "2026-01-01T00:00:00Z", 200, "text/html",
        (s"<html><body>${paras.map(p => s"<p>$p</p>").mkString}" +
          "</body></html>").getBytes("UTF-8"))
    // three proper sentences per page — the C4 page gate drops pages
    // with fewer than 3 sentences, and the point of this arm is pages
    // that PASS vs pages the lorem tell kills
    val s1 = "The first proper sentence has enough words to pass here."
    val s2 = "Here is the second proper sentence with more words now."
    val s3 = "And here is the third proper sentence closing the page."
    def drain(): Unit =
      CorpusStream.runCurated(spark, dir.toString, model,
          ckpt.toString, out.toString, minWords = 12, minStopKinds = 1,
          compactEvery = 1,
          sketchDir = skd.toString, sketchDepth = 3, sketchWidth = 16,
          kmvDir = kvd.toString, kmvK = 8)
        .awaitTermination()
    // drain 0: one admitted page and one GATE-KILLED page (the lorem
    // tell) — had the reject leaked into the sketches, its distinct
    // lorem tokens would shift both
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(
        rec(1, s1, s2, s3),
        rec(2, s1, s2, s3,
          "Lorem ipsum dolor sit amet consectetur adipiscing elit.")),
        gzipPerRecord = true))
    drain()
    // drains 1 and 2: one more admitted page each — after drain 2 the
    // compaction pass has TWO closed partitions (0 and 1) to fold
    // under a negative coverage id (one closed partition is a no-op)
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(
        rec(3, "A different third sentence with plenty of words here.",
          s2, s3)), gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00003.warc.gz"),
      WarcReader.write(Seq(
        rec(4, "Yet another page arrives with its own proper words.",
          s2, s3)), gzipPerRecord = true))
    drain()
    def cmsMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("row"),
        r.getAs[Long]("bucket")) -> r.getAs[Long]("c")).toMap
    val admitted = spark.read.parquet(out.toString)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    assert(spark.read.parquet(out.toString).count() == 3L,
      "gate must have rejected the lorem page")
    assert(cmsMap(CorpusStream.readCmsSketch(spark, skd.toString)) ==
      cmsMap(graft.operators.Sketch.cmsSketch(admitted, "tok", 3, 16)),
      "merged CMS must equal the one-shot sketch of the admitted docs")
    def kmvOf(df: org.apache.spark.sql.DataFrame): Vector[Long] =
      df.collect().map(r =>
        r.getAs[scala.collection.Seq[Long]]("kmv").toVector).head
    assert(kmvOf(CorpusStream.readKmvSketch(spark, kvd.toString, 8)) ==
      kmvOf(graft.operators.Sketch.kmvSketch(
        admitted.select(lit("all").as("g"), col("tok")), "g", "tok", 8)),
      "merged KMV must equal the one-shot sketch of the admitted docs")
    // the re-aggregating compaction actually ran: drains 0 and 1 were
    // folded under one negative coverage id in both sketch dirs
    for (d <- Seq(skd, kvd)) {
      val parts = new java.io.File(d.toString).listFiles.toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName.stripPrefix("batch_id=").toLong).sorted
      assert(parts == Seq(-3L, 2L), s"$d: $parts")
    }
    CacheRegistry.drain()
  }

  test("fuzzy drain token-sketch telemetry: a gate-killed near-dup " +
      "never reaches the sketches (ADMITTED semantics), and the merged " +
      "sketches equal one-shot sketches over the written corpus") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fsk-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("fsk-ckpt")
    val out = java.nio.file.Files.createTempDirectory("fsk-out")
    val bidx = java.nio.file.Files.createTempDirectory("fsk-bidx")
    val skd = java.nio.file.Files.createTempDirectory("fsk-sketch")
    val kvd = java.nio.file.Files.createTempDirectory("fsk-kmv")
    val model = Bpe.learnMerges(Seq("a b ab").toDF("text"), "text", 2)
    def drain(): Unit =
      CorpusStream.runFuzzy(spark, dir.toString, model, ckpt.toString,
          out.toString, bidx.toString,
          sketchDir = skd.toString, sketchDepth = 3, sketchWidth = 16,
          kmvDir = kvd.toString, kmvK = 8)
        .awaitTermination()
    val longA = (1 to 20).map(k => s"ab token$k").mkString(" ")
    val longB = (1 to 20).map(k => s"cc other$k").mkString(" ")
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, longA), htmlRec(2, longB)),
        gzipPerRecord = true))
    drain()
    // drain 1: a near-dup re-crawl of longA (suppressed by the band
    // index — its tokens must NOT enter the sketches) plus a new doc
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(
        htmlRec(3, longA.split(" ").dropRight(1).mkString(" ")),
        htmlRec(4, (1 to 20).map(k => s"dd third$k").mkString(" "))),
        gzipPerRecord = true))
    drain()
    def cmsMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("row"),
        r.getAs[Long]("bucket")) -> r.getAs[Long]("c")).toMap
    val admitted = spark.read.parquet(out.toString)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    assert(spark.read.parquet(out.toString).count() == 3L,
      "the near-dup re-crawl must have been suppressed")
    assert(cmsMap(CorpusStream.readCmsSketch(spark, skd.toString)) ==
      cmsMap(graft.operators.Sketch.cmsSketch(admitted, "tok", 3, 16)))
    def kmvOf(df: org.apache.spark.sql.DataFrame): Vector[Long] =
      df.collect().map(r =>
        r.getAs[scala.collection.Seq[Long]]("kmv").toVector).head
    assert(kmvOf(CorpusStream.readKmvSketch(spark, kvd.toString, 8)) ==
      kmvOf(graft.operators.Sketch.kmvSketch(
        admitted.select(lit("all").as("g"), col("tok")), "g", "tok", 8)))
    CacheRegistry.drain()
  }

  test("chunked drain token-sketch telemetry: the sketches cover the " +
      "drain's DOCUMENTS (the corpus the manifests reassemble — chunk " +
      "novelty must not filter them), merged equals one-shot") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ksk-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("ksk-ckpt")
    val man = java.nio.file.Files.createTempDirectory("ksk-manifest")
    val store = java.nio.file.Files.createTempDirectory("ksk-store")
    val skd = java.nio.file.Files.createTempDirectory("ksk-sketch")
    val kvd = java.nio.file.Files.createTempDirectory("ksk-kmv")
    def drain(): Unit =
      CorpusStream.runChunked(spark, dir.toString, ckpt.toString,
          man.toString, store.toString, divisor = 4,
          sketchDir = skd.toString, sketchDepth = 3, sketchWidth = 16,
          kmvDir = kvd.toString, kmvK = 8)
        .awaitTermination()
    val aTxt = (1 to 40).map(i => s"a$i").mkString(" ")
    // drain 0: a doc; drain 1: a prepended re-crawl whose DOWNSTREAM
    // chunks are all store-known (near-zero novel chunk mass) — its
    // tokens must still count in full, because the document landed
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, aTxt)), gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(htmlRec(2, "XX " + aTxt)),
        gzipPerRecord = true))
    drain()
    def cmsMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("row"),
        r.getAs[Long]("bucket")) -> r.getAs[Long]("c")).toMap
    val docsAll = CorpusStream.readChunkedCorpus(spark, man.toString,
        store.toString)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    assert(cmsMap(CorpusStream.readCmsSketch(spark, skd.toString)) ==
      cmsMap(graft.operators.Sketch.cmsSketch(docsAll, "tok", 3, 16)),
      "document-level sketch must cover re-crawls whose chunks dedup")
    def kmvOf(df: org.apache.spark.sql.DataFrame): Vector[Long] =
      df.collect().map(r =>
        r.getAs[scala.collection.Seq[Long]]("kmv").toVector).head
    assert(kmvOf(CorpusStream.readKmvSketch(spark, kvd.toString, 8)) ==
      kmvOf(graft.operators.Sketch.kmvSketch(
        docsAll.select(lit("all").as("g"), col("tok")), "g", "tok", 8)))
    CacheRegistry.drain()
  }

  test("curated drain with the perplexity gate: a doc scoring below " +
      "the precomputed threshold under the SAVED bigram reference " +
      "never lands, the same doc lands with the gate off, and the " +
      "gated drain's same-batchId replay stays byte-identical") {
    val session = spark
    import session.implicits._
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    // both docs pass C4/Gopher (3 proper sentences, >= 12 words,
    // stopwords); they differ only in how reference-like they read
    val goodText = Seq(
      "the quick brown fox jumps over the lazy dog today.",
      "Here is the second proper sentence now.",
      "And here is the third proper sentence.").mkString("\n")
    val junkText = Seq(
      "the zqpw xvktra qplduv wkrmes jxvnot vztyle bnmdia today.",
      "Here is the wvqzor kxjpan mnrtle sentence now.",
      "And here is the pxvkel qjwmus sentence.").mkString("\n")
    // reference trained ONCE, offline, on good-like text
    val refDir = java.nio.file.Files.createTempDirectory("ppl-ref")
      .toString
    TextAnalysis.saveBigramRef(
      Seq(goodText, "the quick brown fox naps under the old dog.",
        "Here is another proper sentence now.").toDF("text"),
      "text", refDir)
    // the threshold comes from an OFFLINE pass (here: midpoint of the
    // two cleaned-text scores — the spec's stand-in for the
    // perplexityFilter percentile run)
    def cleanOf(t: String): String = TextAnalysis
      .c4LineFilters(Seq(("u", t)).toDF("url", "text"), "text")
      .filter(col("page_keep")).select("clean_text")
      .collect().head.getString(0)
    val scores = TextAnalysis.scoreUnderBigramRef(spark, refDir,
        Seq((1L, cleanOf(goodText)), (2L, cleanOf(junkText)))
          .toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L),
      s"fixture broke: good ${scores(1L)} <= junk ${scores(2L)}")
    val mid = (scores(1L) + scores(2L)) / 2
    def docsDf() = Seq(
      ("https://x.example/p/1", goodText),
      ("https://x.example/p/2", junkText)).toDF("url", "text")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    def urls(dir: java.nio.file.Path): Set[String] =
      spark.read.parquet(dir.toString).select("url").collect()
        .map(_.getString(0)).toSet
    // gate OFF: both land (the junk passes every other battery)
    val plain = java.nio.file.Files.createTempDirectory("ppl-plain")
    CorpusStream.curatedBatch(spark, model, plain.toString, 12, 1)(
      docsDf(), 0L)
    assert(urls(plain) == Set("https://x.example/p/1",
      "https://x.example/p/2"), s"${urls(plain)}")
    // gate ON: only the reference-like doc lands
    val gated = java.nio.file.Files.createTempDirectory("ppl-gated")
    def gatedDrain(): Unit =
      CorpusStream.curatedBatch(spark, model, gated.toString, 12, 1,
        compactEvery = 0, bigramRefDir = refDir, minAvgLogprob = mid)(
        docsDf(), 0L)
    gatedDrain()
    assert(urls(gated) == Set("https://x.example/p/1"), s"${urls(gated)}")
    val snap = spark.read.parquet(gated.toString).collect()
      .map(_.toString).sorted.toSeq
    // at-least-once replay with the gate: byte-identical
    gatedDrain()
    val again = spark.read.parquet(gated.toString).collect()
      .map(_.toString).sorted.toSeq
    assert(again == snap, "gated replay must rewrite, not change")
    CacheRegistry.drain()
  }

  test("curated drain with the NB classifier gate: a doc the saved " +
      "seed classifier scores below threshold never lands, the same " +
      "doc lands with the gate off, and the gated replay stays " +
      "byte-identical") {
    val session = spark
    import session.implicits._
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    // both pass C4/Gopher; they differ in seed-vocabulary overlap
    val goodText = Seq(
      "the quick brown fox jumps over the lazy dog today.",
      "Here is the second proper sentence now.",
      "And here is the third proper sentence.").mkString("\n")
    val junkText = Seq(
      "the zqpw xvktra qplduv wkrmes jxvnot vztyle bnmdia today.",
      "Here is the wvqzor kxjpan mnrtle sentence now.",
      "And here is the pxvkel qjwmus sentence.").mkString("\n")
    // NB seed trained ONCE offline: curated label = good-like text
    val refDir = java.nio.file.Files.createTempDirectory("nb-ref").toString
    TextAnalysis.saveNbRef(Seq(
        (true, goodText),
        (true, "the quick brown fox naps under the old dog."),
        (false, junkText),
        (false, "zzqy wwrtk jjplm sentence vvbnm kkrty.")).toDF(
        "is_curated", "text"),
      "is_curated", "text", refDir)
    def docsDf() = Seq(
      ("https://x.example/n/1", goodText),
      ("https://x.example/n/2", junkText)).toDF("url", "text")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    def urls(dir: java.nio.file.Path): Set[String] =
      spark.read.parquet(dir.toString).select("url").collect()
        .map(_.getString(0)).toSet
    // gate OFF: both land
    val plain = java.nio.file.Files.createTempDirectory("nb-plain")
    CorpusStream.curatedBatch(spark, model, plain.toString, 12, 1)(
      docsDf(), 0L)
    assert(urls(plain) == Set("https://x.example/n/1",
      "https://x.example/n/2"), s"${urls(plain)}")
    // gate ON at the sign threshold: only the seed-like doc lands
    val gated = java.nio.file.Files.createTempDirectory("nb-gated")
    def gatedDrain(): Unit =
      CorpusStream.curatedBatch(spark, model, gated.toString, 12, 1,
        compactEvery = 0, bigramRefDir = null, minAvgLogprob = 0.0,
        blockTerms = Nil, blockPhrases = Nil,
        nbRefDir = refDir, minNbScore = 0.0)(docsDf(), 0L)
    gatedDrain()
    assert(urls(gated) == Set("https://x.example/n/1"), s"${urls(gated)}")
    val snap = spark.read.parquet(gated.toString).collect()
      .map(_.toString).sorted.toSeq
    gatedDrain()
    val again = spark.read.parquet(gated.toString).collect()
      .map(_.toString).sorted.toSeq
    assert(again == snap, "gated replay must rewrite, not change")
    CacheRegistry.drain()
  }

  test("perplexity AND NB gates composed in one drain: a doc must pass " +
      "BOTH — scrambled word order falls to the bigram gate alone, " +
      "off-seed topic falls to the classifier alone") {
    val session = spark
    import session.implicits._
    val model = Bpe.learnMerges(Seq("a b ab").toDF("text"), "text", 2)
    // topic X (the NB-positive seed) and topic Y (NB-negative) share
    // function words; the BIGRAM reference knows BOTH topics
    val topicX = Seq(
      "the quick brown fox jumps over the lazy dog today.",
      "Here is the second proper sentence now.",
      "And here is the third proper sentence.").mkString("\n")
    val scrambledX = Seq(
      "the dog lazy over jumps fox brown quick the today.",
      "Here now sentence proper second the is.",
      "And sentence proper third the is here.").mkString("\n")
    val topicY = Seq(
      "the slow green turtle walks under the old tree today.",
      "Here is the second turtle sentence now.",
      "And here is the third turtle sentence.").mkString("\n")
    val pplRef = java.nio.file.Files.createTempDirectory("both-ppl").toString
    TextAnalysis.saveBigramRef(Seq(topicX, topicY).toDF("text"),
      "text", pplRef)
    val nbRef = java.nio.file.Files.createTempDirectory("both-nb").toString
    TextAnalysis.saveNbRef(Seq(
        (true, topicX), (true, "the quick brown fox naps today."),
        (false, topicY), (false, "the green turtle sleeps today."))
      .toDF("is_curated", "text"), "is_curated", "text", nbRef)
    // threshold between the clean-text scores of topicX and scrambledX
    def cleanOf(t: String): String = TextAnalysis
      .c4LineFilters(Seq(("u", t)).toDF("url", "text"), "text")
      .filter(col("page_keep")).select("clean_text")
      .collect().head.getString(0)
    val ppl = TextAnalysis.scoreUnderBigramRef(spark, pplRef,
        Seq((1L, cleanOf(topicX)), (2L, cleanOf(scrambledX)),
          (3L, cleanOf(topicY))).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(3L) > (ppl(1L) + ppl(2L)) / 2,
      s"fixture broke: topicY ${ppl(3L)} must clear the midpoint")
    val mid = (ppl(1L) + ppl(2L)) / 2
    val docsDf = Seq(
      ("https://x.example/b/1", topicX),
      ("https://x.example/b/2", scrambledX),
      ("https://x.example/b/3", topicY)).toDF("url", "text")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val out = java.nio.file.Files.createTempDirectory("both-out")
    CorpusStream.curatedBatch(spark, model, out.toString, 12, 1,
      compactEvery = 0, bigramRefDir = pplRef, minAvgLogprob = mid,
      blockTerms = Nil, blockPhrases = Nil,
      nbRefDir = nbRef, minNbScore = 0.0)(docsDf, 0L)
    val landed = spark.read.parquet(out.toString).select("url")
      .collect().map(_.getString(0)).toSet
    assert(landed == Set("https://x.example/b/1"),
      s"only the both-gates survivor may land: $landed")
    CacheRegistry.drain()
  }

  test("runCuratedFuzzy: an edited near-dup re-crawl is suppressed by " +
      "the band index BEFORE the quality gates (even a near-dup of a " +
      "quality-REJECTED page), novel pages still curate, and the " +
      "same-batchId replay stays byte-identical") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cfz-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("cfz-ckpt")
    val out = java.nio.file.Files.createTempDirectory("cfz-out")
    val bidx = java.nio.file.Files.createTempDirectory("cfz-bidx")
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    def para(s: String) = s"<p>$s</p>"
    def rec(i: Int, paras: String*): WarcReader.WarcRecord =
      WarcReader.WarcRecord("response", s"https://x.example/p/$i",
        "2026-01-01T00:00:00Z", 200, "text/html",
        (s"<html><body>${paras.map(para).mkString}</body></html>")
          .getBytes("UTF-8"))
    val good = (1 to 6).map(k => s"abab the bc$k cc").mkString(" ") + "."
    val s2 = "Here is the second proper sentence now."
    val s3 = "And here is the third proper sentence."
    val lorem = "Lorem ipsum dolor sit amet consectetur adipiscing elit."
    def drain(): Unit =
      CorpusStream.runCuratedFuzzy(spark, dir.toString, model,
          ckpt.toString, out.toString, bidx.toString,
          minWords = 12, minStopKinds = 1)
        .awaitTermination()
    def urls(): Set[String] =
      spark.read.parquet(out.toString).select("url").collect()
        .map(_.getString(0)).toSet

    // drain 1: p/1 curates; p/4 (textually DISTINCT from p/1 — it must
    // pass the LSH gate) dies on the C4 lorem tell, but its band keys
    // must STILL be indexed
    val good4 = (1 to 6).map(k => s"ab the ccx$k bcy").mkString(" ") + "."
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(
        rec(1, good, s2, s3),
        rec(4, good4, "A different middle sentence lives here.", lorem)),
        gzipPerRecord = true))
    drain()
    assert(urls() == Set("https://x.example/p/1"), s"${urls()}")
    assert(spark.read.parquet(bidx.toString).count() == 32L,
      "both gate-passing pages' keys must be indexed")

    // drain 2: p/2 is p/1 with one word edited (new exact fp, WOULD
    // pass quality) -> suppressed before the gates; p/5 edits the
    // quality-REJECTED p/4 -> suppressed too; p/3 is novel and lands
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(
        rec(2, good, "Here is the second proper sentence today.", s3),
        rec(5, good4, "A different middle sentence lived here.", lorem),
        rec(3, (1 to 6).map(k => s"cc the ab$k bc").mkString(" ") + ".",
          "Novel second proper sentence for this page.",
          "Novel third proper sentence for this page.")),
        gzipPerRecord = true))
    drain()
    assert(urls() == Set("https://x.example/p/1", "https://x.example/p/3"),
      s"near-dups must never reach the quality gates: ${urls()}")
    assert(spark.read.parquet(bidx.toString).count() == 48L,
      "suppressed near-dups must not add keys")

    // same-batchId replay (the foreachBatch at-least-once window):
    // output and index byte-identical before/after
    def snapshot(): (Seq[String], Long) = (
      spark.read.parquet(out.toString).select("url").collect()
        .map(_.getString(0)).sorted.toSeq,
      spark.read.parquet(bidx.toString).count())
    val docs = Seq(("https://x.example/p/9",
        Seq((1 to 6).map(k => s"bc the cc$k ab").mkString(" ") + ".",
          "Replay second proper sentence for this page.",
          "Replay third proper sentence for this page.").mkString("\n")))
      .toDF("url", "text")
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint(
        org.apache.spark.sql.functions.col("text")))
    def exec(): Unit =
      CorpusStream.curatedFuzzyBatch(spark, model, out.toString,
        bidx.toString, 12, 1, 3, 64, 16)(docs, 7L)
    exec()
    val snap1 = snapshot()
    exec()
    assert(snapshot() == snap1, "replay must rewrite, not append")
    CacheRegistry.drain()
  }

  test("compactBatches: old batch_id partitions consolidate into one " +
      "coverage-encoded partition — gate decisions identical, the " +
      "current batch's replay contract untouched, partition count " +
      "bounded, crashed passes self-heal") {
    val session = spark
    import session.implicits._
    val out = java.nio.file.Files.createTempDirectory("cmp-out")
    val bidx = java.nio.file.Files.createTempDirectory("cmp-bidx")
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    def docsDf(rows: (String, String)*) =
      rows.toSeq.toDF("url", "text").withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
    def exec(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      CorpusStream.fuzzyBatch(spark, model, out.toString, bidx.toString,
        3, 64, 16)(batch, id)
    def text(tag: String) =
      (1 to 20).map(k => s"$tag token$k").mkString(" ")
    exec(docsDf("https://x.example/p/0" -> text("aa")), 0L)
    exec(docsDf("https://x.example/p/1" -> text("bb")), 1L)
    exec(docsDf("https://x.example/p/2" -> text("cc")), 2L)
    def partDirs(dir: java.nio.file.Path): Set[String] =
      new java.io.File(dir.toString).listFiles.toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).toSet
    assert(partDirs(bidx) ==
      Set("batch_id=0", "batch_id=1", "batch_id=2"))
    val idxBefore = spark.read.parquet(bidx.toString)
      .select("fp", "band_id", "band_hash").collect().map(_.toString)
      .sorted.toSeq
    // compact everything older than the current batch (id 2)
    assert(CorpusStream.compactBatches(spark, bidx.toString, 2L))
    assert(CorpusStream.compactBatches(spark, out.toString, 2L))
    // bounded: one consolidated partition (coverage -(1+2)) + batch 2
    assert(partDirs(bidx) == Set("batch_id=-3", "batch_id=2"),
      s"${partDirs(bidx)}")
    // the row set is unchanged
    val idxAfter = spark.read.parquet(bidx.toString)
      .select("fp", "band_id", "band_hash").collect().map(_.toString)
      .sorted.toSeq
    assert(idxAfter == idxBefore, "compaction changed the key set")
    // gate decisions identical: a near-dup of COMPACTED batch 0's text
    // is still suppressed, a novel doc still lands
    exec(docsDf(
      "https://x.example/p/9" ->
        text("aa").split(" ").dropRight(1).mkString(" "),
      "https://x.example/p/3" -> text("dd")), 3L)
    val urls = spark.read.parquet(out.toString).select("url").collect()
      .map(_.getString(0)).toSet
    assert(urls == Set("https://x.example/p/0", "https://x.example/p/1",
      "https://x.example/p/2", "https://x.example/p/3"), s"$urls")
    // the current batch's replay contract is untouched: re-execute
    // batch 3 with the same id — byte-identical
    def snapshot(): (Long, Long) = (
      spark.read.parquet(out.toString).count(),
      spark.read.parquet(bidx.toString).count())
    val snap = snapshot()
    exec(docsDf(
      "https://x.example/p/9" ->
        text("aa").split(" ").dropRight(1).mkString(" "),
      "https://x.example/p/3" -> text("dd")), 3L)
    assert(snapshot() == snap, "replay after compaction must rewrite")
    // crashed-pass healing: simulate the window where the consolidated
    // partition landed but a source survived — recreate a covered
    // positive partition, then compact again
    val stale = docsDf("https://x.example/p/0" -> text("aa"))
    graft.operators.Dedup.lshBandKeys(stale, "fp", "text", 3, 64, 16)
      .write.mode("overwrite").parquet(s"$bidx/batch_id=1")
    assert(CorpusStream.compactBatches(spark, bidx.toString, 4L))
    // batch_id=1 (covered by -3) was healed away BEFORE consolidation,
    // so the key set is still exactly the pre-crash one + batch 3's
    val healed = spark.read.parquet(bidx.toString)
      .select("fp", "band_id", "band_hash").collect().map(_.toString)
      .sorted.toSeq
    assert(healed.size == snap._2,
      s"healing must drop covered leftovers: ${healed.size} vs ${snap._2}")
    assert(partDirs(bidx) == Set("batch_id=-5"), s"${partDirs(bidx)}")
    // and a no-op call returns false
    assert(!CorpusStream.compactBatches(spark, bidx.toString, 4L))
    CacheRegistry.drain()
  }

  test("a drain carrying the SAME url twice with different bodies " +
      "lands exactly one coherent row (min-fingerprint winner), not " +
      "two rows of interleaved token ids") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dup-url-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("dup-url-ckpt")
    val out = java.nio.file.Files.createTempDirectory("dup-url-out")
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    // same target URI, two different bodies, one segment = one drain
    val textA = "ab ab bc cc"
    val textB = "cc cc ab"
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, textA), htmlRec(1, textB)),
        gzipPerRecord = true))
    CorpusStream.run(spark, dir.toString, model,
      ckpt.toString, out.toString).awaitTermination()
    val rows = spark.read.parquet(out.toString).collect()
    assert(rows.length == 1, s"must land ONE row: ${rows.toSeq}")
    val gotIds = rows.head.getAs[scala.collection.Seq[Int]]("token_ids")
      .toVector
    // the winner is whichever body has the smaller content fingerprint;
    // its ids must equal the plain batch encoding of THAT text alone
    def enc(t: String): Vector[Int] =
      Bpe.applyModel(Seq(("u", t)).toDF("url", "text"), "url", "text",
        model).collect().head.getAs[scala.collection.Seq[Int]](1).toVector
    assert(gotIds == enc(textA) || gotIds == enc(textB),
      s"interleaved/garbled ids: $gotIds")
    CacheRegistry.drain()
  }

  test("auto-compaction (compactEvery=2): a multi-drain run produces " +
      "IDENTICAL output rows and gate decisions to the uncompacted " +
      "run, keeps the partition count bounded, and the same-batchId " +
      "replay contract survives — including a replay that re-triggers " +
      "the compaction pass") {
    val session = spark
    import session.implicits._
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    def text(tag: String) =
      (1 to 20).map(k => s"$tag token$k").mkString(" ")
    def docsDf(rows: (String, String)*) =
      rows.toSeq.toDF("url", "text").withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
    // the drain sequence: three novel batches, then two batches each
    // pairing a NEAR-DUP of an already-COMPACTED batch's text (must
    // stay suppressed) with a novel doc (must land)
    val drains: Seq[(Long, Seq[(String, String)])] = Seq(
      0L -> Seq("https://x.example/p/0" -> text("aa")),
      1L -> Seq("https://x.example/p/1" -> text("bb")),
      2L -> Seq("https://x.example/p/2" -> text("cc")),
      // novel tags stay inside the model's a/b/c alphabet so every
      // landed row tokenizes (a fully-OOV text yields NO applyModel
      // row and a null token_ids via the left join — a fixture
      // artifact, not a pipeline property worth pinning here)
      3L -> Seq(
        "https://x.example/p/9" ->
          text("aa").split(" ").dropRight(1).mkString(" "),
        "https://x.example/p/3" -> text("ca")),
      4L -> Seq(
        "https://x.example/p/8" ->
          text("bb").split(" ").dropRight(1).mkString(" "),
        "https://x.example/p/4" -> text("ba")))
    def runAll(compactEvery: Int): (java.nio.file.Path, java.nio.file.Path) = {
      val out = java.nio.file.Files.createTempDirectory(s"ac-out-$compactEvery")
      val bidx = java.nio.file.Files.createTempDirectory(s"ac-bidx-$compactEvery")
      drains.foreach { case (id, rows) =>
        CorpusStream.fuzzyBatch(spark, model, out.toString, bidx.toString,
          3, 64, 16, compactEvery)(docsDf(rows: _*), id)
      }
      (out, bidx)
    }
    def outRows(out: java.nio.file.Path): Seq[(String, String)] =
      spark.read.parquet(out.toString).collect()
        .map(r => (r.getAs[String]("url"),
          Option(r.getAs[scala.collection.Seq[Int]]("token_ids"))
            .map(_.mkString(",")).getOrElse("null")))
        .sortBy(identity).toSeq
    def idxKeys(bidx: java.nio.file.Path): Seq[String] =
      spark.read.parquet(bidx.toString)
        .select("fp", "band_id", "band_hash").collect().map(_.toString)
        .sorted.toSeq
    def partDirs(dir: java.nio.file.Path): Set[String] =
      new java.io.File(dir.toString).listFiles.toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).toSet

    val (outC, bidxC) = runAll(compactEvery = 2)
    val (outU, bidxU) = runAll(compactEvery = 0)
    // identical corpus AND identical gate decisions (near-dups of
    // compacted batches stayed suppressed — p/9 and p/8 absent)
    assert(outRows(outC) == outRows(outU),
      s"compacted run diverged:\n${outRows(outC)}\nvs\n${outRows(outU)}")
    assert(outRows(outC).map(_._1).toSet == Set(
      "https://x.example/p/0", "https://x.example/p/1",
      "https://x.example/p/2", "https://x.example/p/3",
      "https://x.example/p/4"))
    assert(idxKeys(bidxC) == idxKeys(bidxU),
      "compaction changed the band-key set")
    // bounded: the trigger at batchId=3 consolidated batches 0-2 into
    // coverage partition -4; the uncompacted run keeps all five
    assert(partDirs(bidxC) ==
      Set("batch_id=-4", "batch_id=3", "batch_id=4"), s"${partDirs(bidxC)}")
    assert(partDirs(outC) ==
      Set("batch_id=-4", "batch_id=3", "batch_id=4"), s"${partDirs(outC)}")
    assert(partDirs(bidxU).size == 5 && partDirs(outU).size == 5)
    // replay contract: re-execute the TRIGGERING drain (id 3) with the
    // same data — byte-identical state, even though the replay re-runs
    // maybeCompact (which must no-op against the consolidated layout)
    val snap = (outRows(outC), idxKeys(bidxC), partDirs(outC), partDirs(bidxC))
    CorpusStream.fuzzyBatch(spark, model, outC.toString, bidxC.toString,
      3, 64, 16, 2)(docsDf(drains(3)._2: _*), 3L)
    assert((outRows(outC), idxKeys(bidxC), partDirs(outC), partDirs(bidxC))
      == snap, "replay of the triggering drain must leave state identical")
    CacheRegistry.drain()
  }

  test("curated drain with the blocklist gate: a page whose CLEANED " +
      "text carries a blocked term or phrase never lands, the same " +
      "pages land with the gate off, a blocked word that only appears " +
      "in a C4-discarded line cannot block, and gated replay stays " +
      "byte-identical") {
    val session = spark
    import session.implicits._
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    // all four pass C4 (3 proper >= 5-word sentences) and Gopher
    // (>= 12 words, a stopword)
    def page(mid: String) = Seq(
      "the quick brown fox jumps over the lazy dog today.",
      mid,
      "And here is the third proper sentence.").mkString("\n")
    val cleanDoc = page("Here is the second proper sentence now.")
    val termDoc = page("Here is the contraband second sentence now.")
    val phraseDoc = page("Here is the truly bad phrase sentence now.")
    // "contraband" alone on a line: dropped by the C4 line filter
    // (no terminal punctuation, < 5 words) BEFORE the blocklist sees it
    val boilerDoc = Seq(
      "the quick brown fox jumps over the lazy dog today.",
      "contraband",
      "Here is the second proper sentence now.",
      "And here is the third proper sentence.").mkString("\n")
    def docsDf() = Seq(
      ("https://x.example/p/clean", cleanDoc),
      ("https://x.example/p/term", termDoc),
      ("https://x.example/p/phrase", phraseDoc),
      ("https://x.example/p/boiler", boilerDoc)).toDF("url", "text")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    def urls(dir: java.nio.file.Path): Set[String] =
      spark.read.parquet(dir.toString).select("url").collect()
        .map(_.getString(0)).toSet
    // gate OFF: all four land
    val plain = java.nio.file.Files.createTempDirectory("blk-plain")
    CorpusStream.curatedBatch(spark, model, plain.toString, 12, 1)(
      docsDf(), 0L)
    assert(urls(plain).size == 4, s"${urls(plain)}")
    // gate ON: the term page and the phrase page are rejected; the
    // page whose blocked word lived only in boilerplate still lands
    val gated = java.nio.file.Files.createTempDirectory("blk-gated")
    def gatedDrain(): Unit =
      CorpusStream.curatedBatch(spark, model, gated.toString, 12, 1,
        compactEvery = 0, bigramRefDir = null, minAvgLogprob = 0.0,
        blockTerms = Seq("contraband"), blockPhrases = Seq("bad phrase"))(
        docsDf(), 0L)
    gatedDrain()
    assert(urls(gated) == Set("https://x.example/p/clean",
      "https://x.example/p/boiler"), s"${urls(gated)}")
    val snap = spark.read.parquet(gated.toString).collect()
      .map(_.toString).sorted.toSeq
    gatedDrain()
    val again = spark.read.parquet(gated.toString).collect()
      .map(_.toString).sorted.toSeq
    assert(again == snap, "gated replay must rewrite, not change")
    CacheRegistry.drain()
  }

  test("chunked ingest: one stored copy per chunk fingerprint across " +
      "batches, a prepended re-crawl contributes only head chunks, " +
      "reconstruction matches the batch extraction, and a same-batchId " +
      "replay rewrites byte-identically") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("cdc-ckpt")
    val man = java.nio.file.Files.createTempDirectory("cdc-manifest")
    val store = java.nio.file.Files.createTempDirectory("cdc-store")
    val aTxt = (1 to 60).map(i => s"a$i").mkString(" ")
    val bTxt = (1 to 30).map(i => s"b$i").mkString(" ")
    val cTxt = "XX " + aTxt // re-crawl of A with a prepended header token
    val dTxt = (1 to 40).map(i => s"d$i").mkString(" ")
    def drain(): Unit = {
      val q = CorpusStream.runChunked(spark, dir.toString, ckpt.toString,
        man.toString, store.toString, divisor = 4)
      q.awaitTermination()
    }
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, aTxt), htmlRec(2, bTxt)),
        gzipPerRecord = true))
    drain()
    // segment 2: a prepended near-copy under a NEW url, a fresh doc,
    // and a SAME-URL re-crawl of p/1 with edited content (new fp, so
    // the content dedup admits it — reassembly must version it, not
    // interleave the two recipes)
    val a2Txt = "YY " + aTxt
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(htmlRec(3, cTxt), htmlRec(4, dTxt),
        htmlRec(1, a2Txt)), gzipPerRecord = true))
    drain()

    val storeDf = spark.read.parquet(store.toString)
    val dupFps = storeDf.groupBy("chunk_fp").count()
      .filter(col("count") > 1).count()
    assert(dupFps == 0, "the store must hold ONE copy per fingerprint")
    def fpsOf(batch: Long): Set[String] =
      storeDf.filter(col("batch_id") === batch)
        .select("chunk_fp").collect().map(_.getString(0)).toSet
    val b0 = fpsOf(0L)
    val b1 = fpsOf(1L)
    assert(b0.intersect(b1).isEmpty, "cross-batch fps must be disjoint")

    // batch-path parity: batch 1's novel fps are exactly cdcChunks(C, D)
    // minus what batch 0 stored
    def batchFps(rows: Seq[(Long, String)]): Set[String] =
      graft.operators.Dedup.cdcChunks(rows.toDF("doc_id", "text"),
        "doc_id", "text", 4)
        .select("chunk_fp").distinct().collect().map(_.getString(0)).toSet
    val cd = batchFps(Seq((1L, a2Txt), (3L, cTxt), (4L, dTxt)))
    assert(b1 == cd -- b0,
      s"streamed novelty gate must match the batch chunker: " +
        s"extra=${b1 -- (cd -- b0)} missing=${(cd -- b0) -- b1}")
    // the prepended variants (C and the p/1 re-crawl) share every
    // downstream chunk with the stored A: beyond D's own chunks, at
    // most 2 head chunks EACH are novel
    val dOnly = batchFps(Seq((4L, dTxt)))
    assert((b1 -- dOnly).size <= 4,
      s"variants must contribute only head chunks, got ${(b1 -- dOnly).size}")

    // reconstruction: the LATEST version wins per url — the re-crawled
    // p/1 reassembles to its edited batch-1 text, never an interleave
    val expected = Map(
      "https://x.example/p/1" -> a2Txt,
      "https://x.example/p/2" -> bTxt,
      "https://x.example/p/3" -> cTxt,
      "https://x.example/p/4" -> dTxt)
    val rebuilt = CorpusStream.readChunkedCorpus(spark, man.toString,
      store.toString)
      .collect().map(r => r.getString(r.fieldIndex("url")) ->
        r.getString(r.fieldIndex("text"))).toMap
    assert(rebuilt == expected,
      s"reassembly must be latest-version exact: $rebuilt")

    // crash-replay of batch 1: same batchId + same docs → byte-identical
    def snap(): Seq[String] =
      (spark.read.parquet(store.toString).collect().map(_.toString) ++
        spark.read.parquet(man.toString).collect().map(_.toString))
        .sorted.toSeq
    val before = snap()
    val batch1 = Seq(("https://x.example/p/3", cTxt),
      ("https://x.example/p/4", dTxt),
      ("https://x.example/p/1", a2Txt)).toDF("url", "text")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    CorpusStream.chunkedBatch(spark, man.toString, store.toString, 4)(
      batch1, 1L)
    assert(snap() == before, "replay must rewrite, not change")

    // integration read (r15 verdict stretch #8): the chunk store's
    // REASSEMBLED corpus feeds the boundary-respecting packer — the
    // decision a fine-tuning pipeline makes over a live chunked ingest
    // — and because reconstruction is exact, the packing layout is
    // IDENTICAL to packing the original texts directly (doc ids are
    // xxhash64(url) shifted into [0, 2^63) — the firstFitBlocks span
    // contract — the same key both sides, so shards and blocks
    // coincide bit for bit)
    def packed(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Packing.firstFitBlocks(
          df.select(shiftrightunsigned(xxhash64(col("url")), 1)
            .as("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long")
              .as("n_tokens")),
          "doc_id", "n_tokens", blockSize = 16L, shards = 4,
          lengthDescending = true)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("shard"), r.getAs[Long]("block")))).toMap
    val viaStore = packed(CorpusStream.readChunkedCorpus(spark,
      man.toString, store.toString))
    val viaDirect = packed(expected.toSeq.toDF("url", "text"))
    assert(viaStore.size == 4 && viaStore == viaDirect,
      s"packing the reassembled corpus must equal packing the " +
        s"originals: $viaStore vs $viaDirect")
    CacheRegistry.drain()
  }

  test("picks→execute at the ingest boundary: the curated drain reads " +
      "minNbScore from the decision relation's nb_threshold row, the " +
      "streamed output equals the batch chain at the PICKED threshold, " +
      "and a knob missing from the relation falls back to the caller " +
      "constant") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("picks-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("picks-ckpt")
    val out = java.nio.file.Files.createTempDirectory("picks-out")
    val model = Bpe.learnMerges(
      Seq("abab abab bc cc ab", "bc bc abab cc a b c").toDF("text"),
      "text", numMerges = 4)
    val goodParas = Seq(
      "the quick brown fox jumps over the lazy dog today.",
      "Here is the second proper sentence now.",
      "And here is the third proper sentence.")
    val junkParas = Seq(
      "the zqpw xvktra qplduv wkrmes jxvnot vztyle bnmdia today.",
      "Here is the wvqzor kxjpan mnrtle sentence now.",
      "And here is the pxvkel qjwmus sentence.")
    val refDir = java.nio.file.Files.createTempDirectory("picks-nb").toString
    TextAnalysis.saveNbRef(Seq(
        (true, goodParas.mkString("\n")),
        (true, "the quick brown fox naps under the old dog."),
        (false, junkParas.mkString("\n")),
        (false, "zzqy wwrtk jjplm sentence vvbnm kkrty.")).toDF(
        "is_curated", "text"),
      "is_curated", "text", refDir)
    def rec(i: Int, paras: Seq[String]): WarcReader.WarcRecord =
      WarcReader.WarcRecord("response", s"https://x.example/k/$i",
        "2026-01-01T00:00:00Z", 200, "text/html",
        (s"<html><body>${paras.map(p => s"<p>$p</p>").mkString}" +
          "</body></html>").getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(rec(1, goodParas), rec(2, junkParas)),
        gzipPerRecord = true))
    // the decision relation, q200's output shape (extra columns ride
    // along untouched): nb_threshold = 0.0 — the sign threshold the
    // q188 PR-curve rule would pick on this seed
    val picksDir = java.nio.file.Files
      .createTempDirectory("picks-rel").toString
    CorpusStream.writePicks(Seq(
        ("nb_threshold", "smallest threshold with precision >= 1/2",
          0.0, 0.5, 1L)).toDF(
        "knob", "rule", "chosen", "quality_r6", "cost"), picksDir)
    // caller constant is ADMIT-EVERYTHING (-1e9): if the drain ran at
    // the constant, both docs would land — only the pick rejects junk
    CorpusStream.runCurated(spark, dir.toString, model, ckpt.toString,
        out.toString, minWords = 12, minStopKinds = 1,
        nbRefDir = refDir, minNbScore = -1e9, picksDir = picksDir)
      .awaitTermination()
    def rows(d: String): Map[String, Vector[Int]] =
      spark.read.parquet(d).collect()
        .map(r => r.getAs[String]("url") ->
          Option(r.getAs[scala.collection.Seq[Int]]("token_ids"))
            .map(_.toVector).orNull).toMap
    val streamed = rows(out.toString)
    assert(streamed.keySet == Set("https://x.example/k/1"),
      s"the pick (0.0) must gate junk out: ${streamed.keySet}")
    // batch-chain parity AT THE PICKED KNOB: the same extraction and
    // curated chain run directly with minNbScore = 0.0
    val batchDocs = WarcReader.read(spark, dir.toString + "/*.warc*")
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri").as("url"),
        TextAnalysis.htmlToTextLines(decode(col("body"), "UTF-8"))
          .as("text"))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val batchOut = java.nio.file.Files.createTempDirectory("picks-batch")
    CorpusStream.curatedBatch(spark, model, batchOut.toString, 12, 1,
      compactEvery = 0, bigramRefDir = null, minAvgLogprob = 0.0,
      blockTerms = Nil, blockPhrases = Nil,
      nbRefDir = refDir, minNbScore = 0.0)(batchDocs, 0L)
    assert(streamed == rows(batchOut.toString),
      "the picks-driven drain must equal the batch chain at the " +
        "picked threshold")
    // FALLBACK: a relation NOT carrying nb_threshold leaves the
    // caller constant in force — admit-everything lands both docs
    val partialPicks = java.nio.file.Files
      .createTempDirectory("picks-partial").toString
    CorpusStream.writePicks(
      Seq(("cdc_divisor", 16.0)).toDF("knob", "chosen"), partialPicks)
    val ckpt2 = java.nio.file.Files.createTempDirectory("picks-ckpt2")
    val out2 = java.nio.file.Files.createTempDirectory("picks-out2")
    CorpusStream.runCurated(spark, dir.toString, model, ckpt2.toString,
        out2.toString, minWords = 12, minStopKinds = 1,
        nbRefDir = refDir, minNbScore = -1e9, picksDir = partialPicks)
      .awaitTermination()
    assert(rows(out2.toString).keySet == Set("https://x.example/k/1",
      "https://x.example/k/2"),
      "a missing knob must fall back to the caller constant")
    CacheRegistry.drain()
  }

  test("picks→execute, chunked and fuzzy drains: cdc_divisor drives " +
      "the chunker (store equals the batch chunker at the picked " +
      "divisor), lsh_bands drives the band-key layout, and " +
      "misconfiguration fails fast (missing dir, fractional or " +
      "non-dividing banding)") {
    val session = spark
    import session.implicits._
    val model = Bpe.learnMerges(Seq("a b c ab").toDF("text"), "text", 2)
    val aTxt = (1 to 60).map(i => s"a$i").mkString(" ")
    val bTxt = (1 to 30).map(i => s"b$i").mkString(" ")
    val picksDir = java.nio.file.Files
      .createTempDirectory("picks2-rel").toString
    CorpusStream.writePicks(Seq(
        ("cdc_divisor", 4.0), ("lsh_bands", 8.0)).toDF("knob", "chosen"),
      picksDir)
    // chunked drain at caller divisor 16, picks say 4: the store must
    // equal the batch chunker at 4 (and differ from 16's chunking)
    val dir = java.nio.file.Files.createTempDirectory("picks2-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("picks2-ckpt")
    val man = java.nio.file.Files.createTempDirectory("picks2-man")
    val store = java.nio.file.Files.createTempDirectory("picks2-store")
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, aTxt), htmlRec(2, bTxt)),
        gzipPerRecord = true))
    CorpusStream.runChunked(spark, dir.toString, ckpt.toString,
        man.toString, store.toString, divisor = 16,
        picksDir = picksDir)
      .awaitTermination()
    def batchFps(divisor: Int): Set[String] =
      graft.operators.Dedup.cdcChunks(
          Seq((1L, aTxt), (2L, bTxt)).toDF("doc_id", "text"),
          "doc_id", "text", divisor)
        .select("chunk_fp").distinct().collect().map(_.getString(0)).toSet
    val stored = spark.read.parquet(store.toString)
      .select("chunk_fp").collect().map(_.getString(0)).toSet
    assert(batchFps(4) != batchFps(16),
      "fixture broke: the two divisors must chunk differently")
    assert(stored == batchFps(4),
      "the picks-driven chunker must equal the batch chunker at the " +
        s"PICKED divisor: extra=${stored -- batchFps(4)} " +
        s"missing=${batchFps(4) -- stored}")
    // fuzzy drain at caller bands=16, picks say 8: the band-key index
    // layout follows the pick — 8 keys per admitted doc, equal to the
    // batch chain's band keys at (k=64, bands=8)
    val fdir = java.nio.file.Files.createTempDirectory("picks2-fz")
    val fckpt = java.nio.file.Files.createTempDirectory("picks2-fckpt")
    val fout = java.nio.file.Files.createTempDirectory("picks2-fout")
    val bidx = java.nio.file.Files.createTempDirectory("picks2-bidx")
    java.nio.file.Files.write(fdir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, aTxt)), gzipPerRecord = true))
    CorpusStream.runFuzzy(spark, fdir.toString, model, fckpt.toString,
        fout.toString, bidx.toString, k = 64, bands = 16,
        picksDir = picksDir)
      .awaitTermination()
    val idx = spark.read.parquet(bidx.toString)
      .select("band_id", "band_hash").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSet
    val streamedText = spark.read.parquet(fout.toString)
      .select("url", "text")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val want = graft.operators.Dedup.lshBandKeys(streamedText, "fp",
        "text", 3, 64, 8)
      .select("band_id", "band_hash").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSet
    assert(idx.size == 8 && idx == want,
      s"band-key layout must follow the picked banding: $idx vs $want")
    // neardup_jaccard drives the dup-mass TELEMETRY threshold: at the
    // picked 1.0 a prepended near-copy (jaccard < 1) must NOT cluster,
    // while the caller's 0.7 default would have collapsed the pair
    val nTxt = "XX " + aTxt
    assert(graft.operators.Dedup.dupMassHistogram(
        Seq((1L, aTxt), (2L, nTxt)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.7)
      .filter(col("size") >= 2).count() > 0,
      "fixture broke: the pair must cluster at 0.7")
    val pick3 = java.nio.file.Files
      .createTempDirectory("picks2-thr").toString
    CorpusStream.writePicks(Seq(
        ("cdc_divisor", 4.0), ("neardup_jaccard", 1.0))
      .toDF("knob", "chosen"), pick3)
    val tdir = java.nio.file.Files.createTempDirectory("picks2-t")
    val tckpt = java.nio.file.Files.createTempDirectory("picks2-tck")
    val tman = java.nio.file.Files.createTempDirectory("picks2-tman")
    val tstore = java.nio.file.Files.createTempDirectory("picks2-tst")
    val tdm = java.nio.file.Files.createTempDirectory("picks2-tdm")
    java.nio.file.Files.write(tdir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(htmlRec(1, aTxt), htmlRec(2, nTxt)),
        gzipPerRecord = true))
    CorpusStream.runChunked(spark, tdir.toString, tckpt.toString,
        tman.toString, tstore.toString, divisor = 16,
        dupMassDir = tdm.toString, picksDir = pick3)
      .awaitTermination()
    val tele = CorpusStream.readDupMassTelemetry(spark, tdm.toString)
    assert(tele.filter(col("size") >= 2).count() == 0,
      "the picked 1.0 threshold must keep the near-copy unclustered")
    // fail-fast arms
    intercept[IllegalArgumentException] {
      CorpusStream.readPicks(spark, "/nonexistent/picks-dir")
    }
    val badFrac = java.nio.file.Files
      .createTempDirectory("picks2-frac").toString
    CorpusStream.writePicks(
      Seq(("lsh_bands", 7.5)).toDF("knob", "chosen"), badFrac)
    intercept[IllegalArgumentException] {
      CorpusStream.runFuzzy(spark, fdir.toString, model,
        fckpt.toString, fout.toString, bidx.toString,
        picksDir = badFrac)
    }
    val badDiv = java.nio.file.Files
      .createTempDirectory("picks2-div").toString
    CorpusStream.writePicks(
      Seq(("lsh_bands", 6.0)).toDF("knob", "chosen"), badDiv)
    intercept[IllegalArgumentException] {
      CorpusStream.runFuzzy(spark, fdir.toString, model,
        fckpt.toString, fout.toString, bidx.toString, k = 64,
        picksDir = badDiv)
    }
    // LAYOUT PIN: the band index was written under bands=8 — a later
    // drain configured for a DIFFERENT (valid) banding must fail at
    // stream start, not silently stop matching the persisted keys;
    // same for the chunk store's divisor
    val rebandPicks = java.nio.file.Files
      .createTempDirectory("picks2-reband").toString
    CorpusStream.writePicks(
      Seq(("lsh_bands", 4.0)).toDF("knob", "chosen"), rebandPicks)
    intercept[IllegalArgumentException] {
      CorpusStream.runFuzzy(spark, fdir.toString, model,
        fckpt.toString, fout.toString, bidx.toString, k = 64,
        picksDir = rebandPicks)
    }
    intercept[IllegalArgumentException] {
      CorpusStream.runChunked(spark, dir.toString, ckpt.toString,
        man.toString, store.toString, divisor = 16)
    }
    // unchanged knobs re-enter freely (the pin is equality, not a lock)
    CorpusStream.runChunked(spark, dir.toString, ckpt.toString,
        man.toString, store.toString, divisor = 16, picksDir = picksDir)
      .awaitTermination()
    // empty and duplicate picks relations fail fast
    val emptyPicks = java.nio.file.Files
      .createTempDirectory("picks2-empty").toString
    CorpusStream.writePicks(
      Seq(("x", 1.0)).toDF("knob", "chosen").filter(col("chosen") > 2),
      emptyPicks)
    intercept[IllegalArgumentException] {
      CorpusStream.readPicks(spark, emptyPicks)
    }
    val dupPicks = java.nio.file.Files
      .createTempDirectory("picks2-dup").toString
    CorpusStream.writePicks(
      Seq(("lsh_bands", 8.0), ("lsh_bands", 4.0)).toDF("knob", "chosen"),
      dupPicks)
    intercept[IllegalArgumentException] {
      CorpusStream.readPicks(spark, dupPicks)
    }
    // an INT-typed chosen column written outside writePicks still reads
    assert(CorpusStream.readPicks(spark, {
      val d = java.nio.file.Files
        .createTempDirectory("picks2-int").toString
      Seq(("cdc_divisor", 4)).toDF("knob", "chosen")
        .write.mode("overwrite").parquet(d)
      d
    }) == Map("cdc_divisor" -> 4.0))
    CacheRegistry.drain()
  }

  test("token-stats telemetry: the drains emit the exact per-source " +
      "relation the epoch planner consumes — planFromTokenStats equals " +
      "the plan computed directly over the admitted corpus, stats are " +
      "post-dedup, and compaction re-aggregates to <= |sources| rows") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("ts-ckpt")
    val out = java.nio.file.Files.createTempDirectory("ts-out")
    val stats = java.nio.file.Files.createTempDirectory("ts-stats")
    val model = Bpe.learnMerges(Seq("a b c ab").toDF("text"), "text", 2)
    def rec(host: String, i: Int, words: Int): WarcReader.WarcRecord =
      WarcReader.WarcRecord("response", s"https://$host/p/$i",
        "2026-01-01T00:00:00Z", 200, "text/html",
        (s"<html><body><p>u$i " +
          (1 to words).map(k => s"w$k").mkString(" ") +
          "</p></body></html>").getBytes("UTF-8"))
    def drain(): Unit =
      CorpusStream.run(spark, dir.toString, model, ckpt.toString,
          out.toString, tokenStatsDir = stats.toString,
          compactEvery = 1)
        .awaitTermination()
    val A = "a-news.example"; val B = "b-blog.example"
    // drain 0: two A docs (one above, one below the 20-token quality
    // floor) and one B doc
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(rec(A, 1, 25), rec(A, 2, 5), rec(B, 3, 30)),
        gzipPerRecord = true))
    drain()
    // drain 1: one more A doc, one short B doc, and an exact duplicate
    // of doc 1's TEXT under a new B url — the dedup gate drops it, so
    // it must not buy B any stats mass (post-dedup contract)
    val dup = WarcReader.WarcRecord("response", s"https://$B/p/99",
      "2026-01-01T00:00:00Z", 200, "text/html",
      ("<html><body><p>u1 " +
        (1 to 25).map(k => s"w$k").mkString(" ") +
        "</p></body></html>").getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(rec(A, 4, 22), dup, rec(B, 5, 8)),
        gzipPerRecord = true))
    drain()
    // drain 2: one long B doc; compactEvery=1 consolidates batches 0-1
    java.nio.file.Files.write(dir.resolve("seg-00003.warc.gz"),
      WarcReader.write(Seq(rec(B, 6, 40)), gzipPerRecord = true))
    drain()

    // the accumulated stats equal a direct aggregation of the ADMITTED
    // corpus (urls in `out` — the dedup-dropped p/99 is absent)
    val admitted = spark.read.parquet(out.toString)
      .select(TextAnalysis.registrableDomain(col("url")).as("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
    val directStats = admitted.groupBy("source")
      .agg(sum(col("nt")).as("unique_tokens"),
        expr("(1000000 * sum(CASE WHEN nt >= 20 THEN 1 ELSE 0 END))" +
          " DIV count(*)").as("weight_ppm"))
      .collect().map(_.toString).sorted.toSeq
    val teleStats = CorpusStream.readTokenStats(spark, stats.toString)
      .collect().map(_.toString).sorted.toSeq
    assert(teleStats == directStats,
      s"telemetry stats must equal the direct aggregation: " +
        s"$teleStats vs $directStats")
    assert(spark.read.parquet(out.toString)
      .filter(col("url") === s"https://$B/p/99").isEmpty,
      "fixture broke: the duplicate must have been gated")
    // the planner runs off the telemetry alone and matches the plan
    // computed from the corpus
    val per = admitted.groupBy("source")
      .agg(sum(col("nt")).as("unique_tokens"),
        expr("(1000000 * sum(CASE WHEN nt >= 20 THEN 1 ELSE 0 END))" +
          " DIV count(*)").as("weight_ppm"))
      .filter(col("unique_tokens") > 0)
    val total = per.agg(sum(col("unique_tokens"))).collect()(0).getLong(0)
    val want = graft.operators.Sampling.epochPlan(per, 47L * total / 20L,
      maxEpochs = 4).collect().map(_.toString).sorted.toSeq
    val got = CorpusStream.planFromTokenStats(spark, stats.toString)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, s"telemetry plan must equal corpus plan: " +
      s"$got vs $want")
    // drain 2's compaction consolidated batches 0-1 into a
    // RE-AGGREGATED coverage partition: <= |sources| rows, not one
    // row set per drain
    val parts = new java.io.File(stats.toString).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).sorted
    assert(parts == Seq(-3L, 2L), s"stats partitions: $parts")
    assert(spark.read.parquet(s"$stats/batch_id=-3")
      .groupBy("source").count().filter(col("count") > 1).isEmpty,
      "the coverage partition must be re-aggregated per source")
    CacheRegistry.drain()
  }

  test("commitFromTokenStats: the LIVE plan-commit decision runs off " +
      "the telemetry alone — it equals planCommitRule over the plans " +
      "replayed from the admitted corpus at each landing, and " +
      "compaction coarsens the ladder to the retained landings") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pc-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("pc-ckpt")
    val out = java.nio.file.Files.createTempDirectory("pc-out")
    val stats = java.nio.file.Files.createTempDirectory("pc-stats")
    val model = Bpe.learnMerges(Seq("a b c ab").toDF("text"), "text", 2)
    def rec(host: String, i: Int, words: Int): WarcReader.WarcRecord =
      WarcReader.WarcRecord("response", s"https://$host/p/$i",
        "2026-01-01T00:00:00Z", 200, "text/html",
        (s"<html><body><p>u$i " +
          (1 to words).map(k => s"w$k").mkString(" ") +
          "</p></body></html>").getBytes("UTF-8"))
    // compactEvery = 0: every landing stays re-derivable
    def drain(): Unit =
      CorpusStream.run(spark, dir.toString, model, ckpt.toString,
          out.toString, tokenStatsDir = stats.toString)
        .awaitTermination()
    val A = "a-news.example"; val B = "b-blog.example"
    val C = "c-wiki.example"
    // landing 0: A dominates; landing 1: B arrives (so B CANNOT have
    // settled at 0 — absence counts as unsettled); landing 2: C tail
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(rec(A, 1, 60), rec(A, 2, 45), rec(C, 3, 25)),
        gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00002.warc.gz"),
      WarcReader.write(Seq(rec(B, 4, 40), rec(A, 5, 21)),
        gzipPerRecord = true))
    drain()
    java.nio.file.Files.write(dir.resolve("seg-00003.warc.gz"),
      WarcReader.write(Seq(rec(C, 6, 22)), gzipPerRecord = true))
    drain()

    // the batch-side replay: per-landing plans computed DIRECTLY from
    // the admitted corpus (batch_id surfaces as the out partition
    // column), q212/q213's snapshot-budget semantics
    val admitted = spark.read.parquet(out.toString)
      .select(col("batch_id").cast("long").as("b"),
        TextAnalysis.registrableDomain(col("url")).as("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
    def planAt(wm: Long, b20: Long = 47L, deltaDenom: Long = 2L) = {
      val per = admitted.filter(col("b") <= wm)
        .groupBy("source")
        .agg(sum(col("nt")).as("unique_tokens"),
          expr("(1000000 * sum(CASE WHEN nt >= 20 THEN 1 ELSE 0 END))" +
            " DIV count(*)").as("weight_ppm"))
        .filter(col("unique_tokens") > 0)
      val total = per.agg(sum(col("unique_tokens"))).collect()(0)
        .getLong(0)
      graft.operators.Sampling.epochPlanDiscounted(per,
        b20 * total / 20L, maxEpochs = 4, deltaNumer = 1L,
        deltaDenom = deltaDenom)
    }
    val want = graft.operators.Sampling
      .planCommitRule(Seq(0L, 1L, 2L).map(w => w -> planAt(w)))
      .collect().map(_.toString).sorted.toSeq
    val got = CorpusStream.commitFromTokenStats(spark, stats.toString)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want,
      s"live commit decision must equal the corpus replay: $got vs $want")
    // the fixture is non-degenerate: B landed at 1, so it cannot read
    // settled_at_batches = 0
    val bRow = CorpusStream.commitFromTokenStats(spark, stats.toString)
      .filter(col("source") === B).collect()
    assert(bRow.length == 1 && bRow(0).getAs[Long]("settled_at_batches") >= 1L,
      s"B arrived at landing 1 and cannot have settled earlier: " +
        bRow.toSeq)

    // the q206 picks configure the live PLANNER the way they already
    // configure the drain gates: a tighter budget (40/20ths) and a
    // steeper discount (δ = 1/4) flow into every snapshot in the
    // ladder, and the decision equals the replay at those knobs
    val picksDir = java.nio.file.Files
      .createTempDirectory("pc-picks").toString
    CorpusStream.writePicks(
      Seq(("epoch_budget_20ths", 40.0), ("epoch_delta", 0.25))
        .toDF("knob", "chosen"), picksDir)
    val wantP = graft.operators.Sampling
      .planCommitRule(Seq(0L, 1L, 2L).map(w =>
        w -> planAt(w, b20 = 40L, deltaDenom = 4L)))
      .collect().map(_.toString).sorted.toSeq
    val gotP = CorpusStream.commitFromTokenStats(spark, stats.toString,
        picksDir = picksDir)
      .collect().map(_.toString).sorted.toSeq
    assert(gotP == wantP,
      s"picked-knob commit must equal the replay at the picked knobs: " +
        s"$gotP vs $wantP")
    // an unswept discount is a malformed relation, not a suggestion
    val badPicks = java.nio.file.Files
      .createTempDirectory("pc-picks-bad").toString
    CorpusStream.writePicks(
      Seq(("epoch_delta", 0.3)).toDF("knob", "chosen"), badPicks)
    intercept[IllegalArgumentException] {
      CorpusStream.planFromTokenStats(spark, stats.toString,
        picksDir = badPicks)
    }

    // consolidate landings 0-1 (coverage partition batch_id=-3 —
    // landing 1) and re-ask: the ladder coarsens to (1, 2), never an
    // invented snapshot the layout no longer carries
    assert(CorpusStream.compactBatches(spark, stats.toString,
      beforeBatch = 2,
      aggregate = _.groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_quality")).as("n_quality"))))
    val want2 = graft.operators.Sampling
      .planCommitRule(Seq(1L, 2L).map(w => w -> planAt(w)))
      .collect().map(_.toString).sorted.toSeq
    val got2 = CorpusStream.commitFromTokenStats(spark, stats.toString)
      .collect().map(_.toString).sorted.toSeq
    assert(got2 == want2,
      s"post-compaction ladder must match the retained landings: " +
        s"$got2 vs $want2")
    // the allocation-identity gate (tokens_alloc) rides the same
    // ladder — the token-denominated commit the telemetry can answer
    val wantA = graft.operators.Sampling
      .planCommitRule(Seq(1L, 2L).map(w => w -> planAt(w)),
        gateCol = "tokens_alloc")
      .collect().map(_.toString).sorted.toSeq
    val gotA = CorpusStream.commitFromTokenStats(spark, stats.toString,
        gateCol = "tokens_alloc")
      .collect().map(_.toString).sorted.toSeq
    assert(gotA == wantA,
      s"tokens_alloc-gated commit must match the replay: $gotA vs $wantA")
    CacheRegistry.drain()
  }
}
