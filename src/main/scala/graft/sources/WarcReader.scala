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
  * thousands of segment files of a crawl, not within one. `read` maps
  * `SparkContext.binaryFiles` (one `PortableDataStream` per segment)
  * through a STREAMING per-record parse: the segment is never
  * materialized as a byte array, so a task's memory is bounded by one
  * record's body, not the segment — real segments decompress past the
  * JVM's 2 GB array limit, which a whole-file parse cannot represent at
  * all. Malformed framing (including a gzip member truncated
  * mid-stream) ends that FILE's iteration — records already parsed are
  * kept — and never throws: crawl segments are untrusted input.
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
  // damage guards on untrusted framing: a header "line" that runs for
  // 64 KB is not a header, and a record body cannot exceed what a JVM
  // byte array can hold (a Content-Length beyond that is either a lie
  // or a record this representation cannot carry — stop, keep prefix)
  private val MaxHeaderLine = 64 * 1024
  private val MaxBodyBytes = Int.MaxValue - 16L

  /** Parse every record of one WARC file held in memory (plain or
    * gzipped — sniffed by magic). Fixture/test convenience over
    * [[recordIterator]]; malformed tail → parsed prefix, never an
    * exception.
    */
  def parseRecords(fileBytes: Array[Byte]): Seq[WarcRecord] =
    recordIterator(new java.io.ByteArrayInputStream(fileBytes)).toVector

  /** One row per WARC record across a binary-file glob. Each segment is
    * opened as a stream and parsed lazily (`PortableDataStream`, the
    * standard Spark shape for unsplittable archive members) — rows flow
    * out of the iterator without the file ever being whole in memory.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) => recordIterator(pds.open()) }
      .toDF()
  }

  /** Streaming twin of [[read]] — WARC segments as a Structured
    * Streaming source. A crawl lands segment-by-segment (Common Crawl
    * publishes thousands of `.warc.gz` files per dump as they finish),
    * and the file source's checkpointed discovery gives exactly-once
    * per-segment processing: run under `Trigger.AvailableNow` to drain
    * whatever has arrived (the S8 watcher pattern,
    * [[graft.streaming.EventWindows.watchParquetDir]]), or a timed
    * trigger to follow a live crawl.
    *
    * Scale shape: segment DISCOVERY rides the built-in `binaryFile`
    * file source with ONLY the `path` column selected — column pruning
    * keeps the source from ever loading segment content into a row
    * (the whole-content `content` column is the reason binaryFile
    * alone cannot be the parse path: it materializes the segment, and
    * real segments decompress past the 2 GB array limit). Each task
    * then opens its segment directly and runs the same lazy
    * [[recordIterator]] as batch [[read]], so task memory stays
    * bounded by ONE record regardless of segment size, and unreadable
    * or malformed segments contribute their parsed prefix, never an
    * exception. The Hadoop conf travels as broadcast key-value pairs
    * (public API only) so remote filesystems keep their settings.
    */
  def readStream(
      spark: SparkSession, dir: String,
      glob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val confPairs = spark.sparkContext.hadoopConfiguration.iterator()
      .asScala.map(e => (e.getKey, e.getValue)).toArray
    val bc = spark.sparkContext.broadcast(confPairs)
    spark.readStream.format("binaryFile")
      // binaryFile's fixed schema, declared explicitly — streaming
      // sources do not infer (path is all we keep; content is pruned)
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(org.apache.spark.sql.functions.col("path")).as[String]
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        bc.value.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { p =>
          // NonFatal, not just IOException: the documented contract is
          // that an unreadable segment NEVER fails the streaming task,
          // and a malformed URI (IllegalArgumentException from Path) or
          // a filesystem-resolution RuntimeException are as untrusted
          // as the bytes themselves
          val in =
            try {
              val path = new org.apache.hadoop.fs.Path(p)
              Some(path.getFileSystem(conf).open(path))
            } catch { case scala.util.control.NonFatal(_) => None }
          in.iterator.flatMap(recordIterator)
        }
      }
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

  /** Lazy record iterator over one segment stream. Sniffs the gzip magic
    * (buffered mark/reset), then parses records until EOF or damage.
    * ANY IOException — including a truncated gzip member after valid
    * ones — ends iteration with the parsed prefix intact. The stream is
    * closed when iteration ends.
    */
  private[sources] def recordIterator(
      raw: java.io.InputStream): Iterator[WarcRecord] = {
    val in: java.io.InputStream =
      try {
        val buf = new java.io.BufferedInputStream(raw, 64 * 1024)
        buf.mark(2)
        val b0 = buf.read(); val b1 = buf.read()
        buf.reset()
        if (b0 == 0x1f && b1 == 0x8b)
          new java.util.zip.GZIPInputStream(buf, 64 * 1024)
        else buf
      } catch {
        case _: java.io.IOException =>
          try raw.close() catch { case _: java.io.IOException => () }
          return Iterator.empty
      }
    new scala.collection.AbstractIterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      def hasNext: Boolean = {
        if (done) return false
        if (nextRec != null) return true
        nextRec =
          try readRecord(in)
          catch { case _: java.io.IOException => null } // truncated member
        if (nextRec == null) {
          done = true
          try in.close() catch { case _: java.io.IOException => () }
        }
        nextRec != null
      }
      def next(): WarcRecord =
        if (hasNext) { val r = nextRec; nextRec = null; r }
        else Iterator.empty.next()
    }
  }

  /** Read one record from the stream; null on EOF or framing damage. */
  private def readRecord(in: java.io.InputStream): WarcRecord = {
    // leading blank lines tolerate sloppy record separators
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null || !line.startsWith("WARC/")) return null
    val headers = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var hl = readLine(in)
    while (hl != null && hl.nonEmpty) {
      val i = hl.indexOf(':')
      if (i > 0) headers += ((hl.substring(0, i).trim.toLowerCase,
        hl.substring(i + 1).trim))
      hl = readLine(in)
    }
    if (hl == null) return null // EOF inside the header block
    def h(name: String): String =
      headers.collectFirst { case (k, v) if k == name => v }.getOrElse("")
    val len =
      try h("content-length").toLong
      catch { case _: NumberFormatException => -1L }
    if (len < 0 || len > MaxBodyBytes) return null
    val payload = readFully(in, len.toInt)
    if (payload == null) return null // EOF before Content-Length bytes
    // skip the two record-separator CRLFs (tolerate a truncated final
    // separator at end-of-file; misaligned bytes surface as framing
    // damage on the NEXT record, keeping this one — same contract as a
    // whole-buffer parse)
    var skipped = 0
    var eof = false
    while (skipped < 4 && !eof) {
      if (in.read() < 0) eof = true else skipped += 1
    }
    val wtype = h("warc-type")
    val (status, httpCt, body) =
      if (wtype == "response") splitHttp(payload)
      else (-1, "", payload)
    WarcRecord(wtype, h("warc-target-uri"), h("warc-date"),
      status, httpCt, body)
  }

  /** One CRLF-terminated ASCII line, CR stripped; null on EOF-at-start
    * or a line longer than [[MaxHeaderLine]] (framing damage).
    */
  private def readLine(in: java.io.InputStream): String = {
    val sb = new java.lang.StringBuilder(80)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      if (sb.length > MaxHeaderLine) return null
      c = in.read()
    }
    sb.toString
  }

  /** Exactly `n` bytes, or null if the stream ends first. Reads in
    * bounded chunks rather than allocating `n` upfront: a crafted header
    * declaring a ~2 GB Content-Length over a tiny actual body must hit
    * EOF (→ null, framing damage) without ever allocating the declared
    * length — the upfront allocation would surface as an
    * OutOfMemoryError, an Error the iterator's IOException damage
    * handling cannot catch, killing the executor on untrusted input.
    */
  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(n, 64 * 1024))
    val buf = new Array[Byte](64 * 1024)
    var off = 0
    while (off < n) {
      val r = in.read(buf, 0, math.min(buf.length, n - off))
      if (r < 0) return null
      out.write(buf, 0, r)
      off += r
    }
    out.toByteArray
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
