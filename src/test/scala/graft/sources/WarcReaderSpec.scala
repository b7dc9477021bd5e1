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
}
