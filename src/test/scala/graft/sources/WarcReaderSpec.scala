package graft.sources

import graft.SparkSpec

class WarcReaderSpec extends SparkSpec {

  private def rec(id: Int, body: String, wtype: String = "response") =
    WarcReader.WarcRecord(wtype, s"https://x.example/doc/$id",
      "2024-01-01T00:00:00Z", if (wtype == "response") 200 else -1,
      if (wtype == "response") "text/plain" else "", body.getBytes("UTF-8"))

  test("plain and gzip-per-record WARC round-trip: types, URIs, status, " +
      "content-type, and body bytes all survive") {
    val recs = Seq(rec(1, "hello warc body"), rec(2, "second record"),
      rec(3, "{\"info\":1}", wtype = "warcinfo"))
    for (gz <- Seq(false, true)) {
      val parsed = WarcReader.parseRecords(WarcReader.write(recs, gz))
      assert(parsed.length == 3, s"gz=$gz")
      assert(parsed.map(_.warc_type) == Seq("response", "response", "warcinfo"))
      assert(parsed.map(_.target_uri) ==
        recs.map(_.target_uri), s"gz=$gz")
      assert(parsed.take(2).forall(r =>
        r.http_status == 200 && r.http_content_type == "text/plain"))
      assert(parsed(2).http_status == -1)
      assert(parsed.map(r => new String(r.body, "UTF-8")) ==
        Seq("hello warc body", "second record", "{\"info\":1}"))
    }
  }

  test("malformed tails parse the valid prefix and never throw: " +
      "truncated record, garbage bytes, short-count Content-Length") {
    val good = WarcReader.write(Seq(rec(1, "complete")), gzipPerRecord = false)
    val truncated = good ++ WarcReader.write(
      Seq(rec(2, "will be cut")), gzipPerRecord = false).dropRight(20)
    assert(WarcReader.parseRecords(truncated).length == 1)
    assert(WarcReader.parseRecords("not a warc at all".getBytes("UTF-8")).isEmpty)
    assert(WarcReader.parseRecords(Array.emptyByteArray).isEmpty)
    // a gzip header over garbage: empty, not thrown
    assert(WarcReader.parseRecords(
      Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)).isEmpty)
  }

  test("a gzip member truncated mid-stream keeps every record from the " +
      "valid members before it (interrupted segment download)") {
    val twoGood = WarcReader.write(
      Seq(rec(1, "first intact"), rec(2, "second intact")),
      gzipPerRecord = true)
    val cutMember = WarcReader.write(
      Seq(rec(3, "this member is cut")), gzipPerRecord = true)
      .dropRight(15) // inside the deflate stream, past the member header
    val parsed = WarcReader.parseRecords(twoGood ++ cutMember)
    assert(parsed.map(r => new String(r.body, "UTF-8")) ==
      Seq("first intact", "second intact"), parsed.map(_.target_uri))
  }

  test("streaming iterator parses records lazily without materializing " +
      "the segment (bodies arrive before the stream is fully read)") {
    // ~8 KB bodies so the segment (~400 KB) far exceeds the reader's
    // 64 KB buffer — a whole-file materialization would drain available()
    val recs = (1 to 50).map(i => rec(i, s"body-$i " * 1000))
    val bytes = WarcReader.write(recs, gzipPerRecord = false)
    val in = new java.io.ByteArrayInputStream(bytes)
    val it = WarcReader.recordIterator(in)
    val first = it.next()
    assert(new String(first.body, "UTF-8").startsWith("body-1 "))
    // only the first record's framing has been consumed, not the file
    assert(in.available() > bytes.length / 2,
      s"stream was drained eagerly: ${in.available()} of ${bytes.length}")
    assert(it.size == 49) // the rest still parse
  }

  test("Spark read: one row per record across a segment-file glob (the " +
      "Common Crawl processing shape)") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toFile
    try {
      java.nio.file.Files.write(
        new java.io.File(dir, "seg-00001.warc.gz").toPath,
        WarcReader.write(Seq(rec(1, "a"), rec(2, "bb")), gzipPerRecord = true))
      java.nio.file.Files.write(
        new java.io.File(dir, "seg-00002.warc.gz").toPath,
        WarcReader.write(Seq(rec(3, "ccc")), gzipPerRecord = true))
      val out = WarcReader.read(spark, dir.getAbsolutePath + "/*.warc.gz")
        .collect().map(r => (r.getAs[String]("target_uri"),
          new String(r.getAs[Array[Byte]]("body"), "UTF-8"))).toSet
      assert(out == Set(
        ("https://x.example/doc/1", "a"),
        ("https://x.example/doc/2", "bb"),
        ("https://x.example/doc/3", "ccc")))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("readStream: segments arriving incrementally are each processed " +
      "exactly once (checkpointed discovery, AvailableNow drain)") {
    val dir = java.nio.file.Files.createTempDirectory("warc-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("warc-stream-ckpt")
    val stream = WarcReader.readStream(spark, dir.toString)
    // bounded-memory contract, structurally: the only column requested
    // from the binaryFile discovery source is `path` — content loading
    // is pruned away, parsing happens in our per-record iterator
    val projected = stream.queryExecution.analyzed.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.map(_.name)
    }
    assert(projected.contains(Seq("path")),
      s"discovery must request only `path`, got projections: $projected")
    // parquet sink (the crawl-ingest shape; the memory sink cannot
    // recover a checkpoint, which is the very thing under test)
    val out = java.nio.file.Files.createTempDirectory("warc-stream-out")
    def drain(): Unit = {
      val q = stream.writeStream
        .format("parquet")
        .option("path", out.toString)
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def uris(): Seq[String] = spark.read.parquet(out.toString)
      .collect().map(_.getAs[String]("target_uri")).toSeq.sorted
    java.nio.file.Files.write(dir.resolve("seg-00001.warc.gz"),
      WarcReader.write(Seq(rec(1, "alpha"), rec(2, "beta")),
        gzipPerRecord = true))
    drain()
    assert(uris() == Seq("https://x.example/doc/1",
      "https://x.example/doc/2"))
    // second segment arrives — plain (uncompressed) with a malformed
    // tail: only ITS records append; segment 1 is not reprocessed, and
    // the damaged tail contributes its parsed prefix, never an error
    java.nio.file.Files.write(dir.resolve("seg-00002.warc"),
      WarcReader.write(Seq(rec(3, "gamma")), gzipPerRecord = false) ++
        "WARC/1.0\r\ngarbage".getBytes("UTF-8"))
    drain()
    assert(uris() == Seq("https://x.example/doc/1",
      "https://x.example/doc/2", "https://x.example/doc/3"),
      s"exactly-once violated: ${uris()}")
    // schema parity with the batch reader
    assert(stream.schema ==
      WarcReader.read(spark, dir.toString + "/*.warc*").schema)
  }
}
