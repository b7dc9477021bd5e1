package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500) web-archive reader — the native input format of
  * crawled corpora (Common Crawl ships ~100 TB/month of `.warc.gz`
  * segments), so a training-data engine needs it as a first-class
  * source, not a preprocessing script. Pure JVM: record framing is
  * ASCII headers + Content-Length payloads, and the standard
  * member-per-record gzip layout decompresses with the JDK's
  * `GZIPInputStream` (which consumes concatenated members).
  *
  * Scale shape: WARC segments are individually-whole units — gzip
  * members carry no split index, so the parallelism axis is ACROSS the
  * thousands of segment files of a crawl, not within one. `read` maps a
  * `binaryFile` load (one row per segment) through a per-file parse,
  * which is exactly how Common Crawl is processed on any engine; a
  * 1 GB segment bounds a task's memory, and the record iterator streams
  * inside the file. Malformed framing ends that FILE's iteration
  * (records already parsed are kept) and never throws — crawl segments
  * are untrusted input.
  *
  * For `WARC-Type: response` records the HTTP payload splits into the
  * status line, headers, and body; other record types (warcinfo,
  * request, metadata) carry their payload as the body with status -1.
  */
object WarcReader {

  case class WarcRecord(
      warc_type: String, target_uri: String, warc_date: String,
      http_status: Int, http_content_type: String, body: Array[Byte])

  private val Crlf = "\r\n"

  /** Parse every record of one WARC file (plain or gzipped — sniffed by
    * magic). Malformed tail → parsed prefix, never an exception.
    */
  def parseRecords(fileBytes: Array[Byte]): Seq[WarcRecord] = {
    val bytes =
      if (fileBytes.length >= 2 && (fileBytes(0) & 0xff) == 0x1f &&
        (fileBytes(1) & 0xff) == 0x8b) gunzipAll(fileBytes)
      else fileBytes
    val out = Seq.newBuilder[WarcRecord]
    var o = 0
    var ok = true
    while (ok && o < bytes.length) {
      parseOne(bytes, o) match {
        case Some((rec, next)) => out += rec; o = next
        case None => ok = false
      }
    }
    out.result()
  }

  /** One row per WARC record across a binary-file glob (each `.warc` /
    * `.warc.gz` segment parses independently in its task).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(parseRecords _)
      .toDF()
  }

  /** Fixture/round-trip writer: each record becomes one WARC response
    * (or given-type) record; `gzipPerRecord` emits the standard
    * member-per-record `.warc.gz` layout.
    */
  def write(records: Seq[WarcRecord], gzipPerRecord: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val payload: Array[Byte] =
        if (r.warc_type == "response") {
          val head = (s"HTTP/1.1 ${r.http_status} OK" + Crlf +
            s"Content-Type: ${r.http_content_type}" + Crlf +
            s"Content-Length: ${r.body.length}" + Crlf + Crlf)
            .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          head ++ r.body
        } else r.body
      val rec = (s"WARC/1.0" + Crlf +
        s"WARC-Type: ${r.warc_type}" + Crlf +
        s"WARC-Target-URI: ${r.target_uri}" + Crlf +
        s"WARC-Date: ${r.warc_date}" + Crlf +
        (if (r.warc_type == "response")
          "Content-Type: application/http;msgtype=response" + Crlf
        else "Content-Type: application/octet-stream" + Crlf) +
        s"Content-Length: ${payload.length}" + Crlf + Crlf)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        payload ++ (Crlf + Crlf).getBytes("US-ASCII")
      if (gzipPerRecord) {
        val gz = new java.io.ByteArrayOutputStream()
        val s = new java.util.zip.GZIPOutputStream(gz)
        s.write(rec); s.close()
        bos.write(gz.toByteArray)
      } else bos.write(rec)
    }
    bos.toByteArray
  }

  // ------------------------------------------------------------ internals

  private def gunzipAll(gz: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => Array.emptyByteArray }

  /** Parse one record at `start`; None on any framing damage. */
  private def parseOne(b: Array[Byte], start: Int)
      : Option[(WarcRecord, Int)] = {
    val headEnd = indexOfDoubleCrlf(b, start)
    if (headEnd < 0) return None
    val head = new String(b, start, headEnd - start,
      java.nio.charset.StandardCharsets.US_ASCII)
    val lines = head.split(Crlf)
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    def h(name: String): String = lines.iterator.drop(1)
      .map(_.split(":", 2)).collectFirst {
        case Array(k, v) if k.trim.equalsIgnoreCase(name) => v.trim
      }.getOrElse("")
    val len =
      try h("Content-Length").toLong
      catch { case _: NumberFormatException => -1L }
    val payloadStart = headEnd + 4
    if (len < 0 || payloadStart + len > b.length) return None
    val payload = java.util.Arrays.copyOfRange(
      b, payloadStart, (payloadStart + len).toInt)
    val wtype = h("WARC-Type")
    val (status, httpCt, body) =
      if (wtype == "response") splitHttp(payload)
      else (-1, "", payload)
    // past the payload and the two record-separator CRLFs (tolerate a
    // truncated final separator at end-of-file)
    val next = math.min(b.length, (payloadStart + len).toInt + 4)
    Some((WarcRecord(wtype, h("WARC-Target-URI"), h("WARC-Date"),
      status, httpCt, body), next))
  }

  private def splitHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val he = indexOfDoubleCrlf(payload, 0)
    if (he < 0) return (-1, "", payload)
    val head = new String(payload, 0, he,
      java.nio.charset.StandardCharsets.US_ASCII)
    val lines = head.split(Crlf)
    val status =
      if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
        val parts = lines(0).split(" ")
        if (parts.length >= 2)
          try parts(1).toInt catch { case _: NumberFormatException => -1 }
        else -1
      } else -1
    val ct = lines.iterator.drop(1).map(_.split(":", 2)).collectFirst {
      case Array(k, v) if k.trim.equalsIgnoreCase("Content-Type") => v.trim
    }.getOrElse("")
    (status, ct, java.util.Arrays.copyOfRange(payload, he + 4, payload.length))
  }

  private def indexOfDoubleCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
