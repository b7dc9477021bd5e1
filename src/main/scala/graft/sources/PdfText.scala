package graft.sources

import java.util.zip.Inflater

import scala.collection.mutable

/** Minimal self-contained PDF text extraction (S9 — reference
  * `services/tisk/version_service.py:123-143`, which calls PyMuPDF's
  * `page.get_text()` and joins pages with `"\n\n"`). This container has
  * no PDF library on the offline classpath, so the common subset is
  * implemented directly against the PDF 1.x spec:
  *
  *  - object scan (`N G obj … endobj`), dictionary parsing for the keys
  *    that matter (/Type /Pages /Kids /Contents /Filter /Length),
  *  - page ORDER from the /Root → /Pages → /Kids tree (falling back to
  *    document order when the catalog is malformed),
  *  - /FlateDecode content streams via `java.util.zip.Inflater`
  *    (uncompressed streams pass through),
  *  - text assembly from the content-stream operators: Tj, TJ (arrays
  *    with kerning numbers), ' and " (show-with-newline), with Td / TD /
  *    T* / ET emitting line breaks, literal `(…)` strings (nesting +
  *    escapes + octal) and `<…>` hex strings decoded.
  *
  * Out of scope, documented: CID/Identity-H composite fonts (bytes are
  * decoded as Latin-1 — correct for the standard simple-font encodings),
  * encrypted files, xref streams (the object scan does not need the
  * xref), and predictor-filtered streams. Good for the machine-generated
  * parliamentary prints this stage ingests; anything undecodable
  * degrades to empty text, never an exception.
  */
object PdfText {

  /** Extracted text, pages joined with "\n\n" (the reference's format). */
  def extract(bytes: Array[Byte]): String = {
    try {
      val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val objects = scanObjects(raw)
      val pageIds = pageOrder(objects)
      val pages = pageIds.map { id =>
        val dict = objects(id)._1
        contentsRefs(dict)
          .flatMap(cid => objects.get(cid))
          .map { case (d, stream) => decodeStream(d, stream, bytes, raw) }
          .map(extractTextOps)
          .mkString("")
          .trim
      }
      pages.filter(_.nonEmpty).mkString("\n\n")
    } catch { case _: Exception => "" }
  }

  // ------------------------------------------------------------- objects

  private val ObjRe = """(?s)(\d+)\s+\d+\s+obj\b""".r

  /** id → (dictionary source, stream byte offset/None). The stream's
    * bytes are sliced later (from the original array) so Latin-1
    * round-tripping never corrupts them.
    */
  private def scanObjects(raw: String): Map[Int, (String, Option[(Int, Int)])] = {
    val out = mutable.Map.empty[Int, (String, Option[(Int, Int)])]
    for (m <- ObjRe.findAllMatchIn(raw)) {
      val id = m.group(1).toInt
      val bodyStart = m.end
      val end = raw.indexOf("endobj", bodyStart)
      if (end > bodyStart) {
        val body = raw.substring(bodyStart, end)
        val streamKw = body.indexOf("stream")
        if (streamKw >= 0) {
          val dict = body.substring(0, streamKw)
          // stream data begins after the keyword's EOL (spec: CRLF or LF)
          var s = bodyStart + streamKw + "stream".length
          if (s < raw.length && raw.charAt(s) == '\r') s += 1
          if (s < raw.length && raw.charAt(s) == '\n') s += 1
          val e = directLength(dict) match {
            case Some(len) if s + len <= raw.length => s + len
            case _ =>
              val es = raw.indexOf("endstream", s)
              if (es >= 0) es else s
          }
          out(id) = (dict, Some((s, e)))
        } else out(id) = (body, None)
      }
    }
    out.toMap
  }

  // (?!\d) forbids the regex engine from backtracking into a shorter
  // digit prefix: for an indirect `/Length 10 0 R` the greedy group would
  // otherwise retry "1" (then "0 0 R" no longer matches the lookahead) and
  // report a bogus tiny direct length, silently truncating the stream.
  private val LenRe = """/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)""".r
  private def directLength(dict: String): Option[Int] =
    LenRe.findFirstMatchIn(dict).map(_.group(1).toInt)

  private val RefRe = """(\d+)\s+\d+\s+R""".r

  private def refsAfter(dict: String, key: String): Seq[Int] = {
    val at = dict.indexOf(key)
    if (at < 0) return Nil
    val rest = dict.substring(at + key.length)
    // single ref, or an array of refs: take refs up to the closing
    // bracket (array) / the first ref (scalar)
    val trimmed = rest.dropWhile(_.isWhitespace)
    if (trimmed.startsWith("[")) {
      val close = trimmed.indexOf(']')
      RefRe.findAllMatchIn(trimmed.substring(0, math.max(close, 0)))
        .map(_.group(1).toInt).toSeq
    } else RefRe.findFirstMatchIn(trimmed).map(_.group(1).toInt).toSeq
  }

  private def contentsRefs(dict: String): Seq[Int] = refsAfter(dict, "/Contents")

  /** Page ids in reading order: walk /Type /Catalog → /Pages → /Kids
    * (inner nodes recurse); fall back to document order of /Type /Page
    * objects when the tree is broken.
    */
  private def pageOrder(objects: Map[Int, (String, Option[(Int, Int)])]): Seq[Int] = {
    def isType(dict: String, t: String): Boolean =
      ("""/Type\s*/""" + t + """\b""").r.findFirstIn(dict).isDefined
    val catalog = objects.collectFirst {
      case (_, (d, _)) if isType(d, "Catalog") => d
    }
    val fromTree = catalog.flatMap { c =>
      refsAfter(c, "/Pages").headOption.map { rootId =>
        val seen = mutable.Set.empty[Int]
        def walk(id: Int): Seq[Int] =
          if (!seen.add(id)) Nil
          else objects.get(id) match {
            case Some((d, _)) if isType(d, "Page") => Seq(id)
            case Some((d, _)) => refsAfter(d, "/Kids").flatMap(walk)
            case None => Nil
          }
        walk(rootId)
      }
    }.filter(_.nonEmpty)
    fromTree.getOrElse(
      objects.toSeq
        .filter { case (_, (d, _)) => isType(d, "Page") }
        .map(_._1).sorted)
  }

  private def decodeStream(dict: String, span: Option[(Int, Int)],
      bytes: Array[Byte], raw: String): String = span match {
    case None => ""
    case Some((s, e)) =>
      val data = java.util.Arrays.copyOfRange(bytes, s, math.min(e, bytes.length))
      val out =
        if (dict.contains("/FlateDecode")) inflate(data)
        else data
      new String(out, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  // ------------------------------------------------- content-stream text

  /** Walk the content stream's postfix operator syntax, collecting shown
    * strings; Td, TD, T-star, ET and the quote-family imply line breaks.
    */
  private[sources] def extractTextOps(content: String): String = {
    val sb = new StringBuilder
    val operands = mutable.ArrayBuffer.empty[String] // decoded strings only
    var i = 0
    val n = content.length

    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb.append('\n')

    def flushShow(): Unit = { operands.foreach(sb.append(_)); operands.clear() }

    while (i < n) {
      val c = content.charAt(i)
      c match {
        case '(' =>
          val (s, next) = literalString(content, i)
          operands += s; i = next
        case '<' if i + 1 < n && content.charAt(i + 1) != '<' =>
          val close = content.indexOf('>', i)
          if (close < 0) i = n
          else {
            operands += hexString(content.substring(i + 1, close))
            i = close + 1
          }
        case '[' | ']' => i += 1 // TJ array brackets; numbers are skipped below
        case '%' => // comment to EOL
          val eol = content.indexWhere(ch => ch == '\n' || ch == '\r', i)
          i = if (eol < 0) n else eol
        case ch if ch.isLetter || ch == '\'' || ch == '"' || ch == '*' =>
          val j = {
            var k = i
            while (k < n && !content.charAt(k).isWhitespace &&
              !"()<>[]/%".contains(content.charAt(k))) k += 1
            k
          }
          content.substring(i, j) match {
            case "Tj" | "TJ" => flushShow()
            case "'" => newline(); flushShow()
            case "\"" => newline(); flushShow()
            case "Td" | "TD" | "T*" => operands.clear(); newline()
            case "ET" => operands.clear(); newline()
            case _ => operands.clear() // other operators consume operands
          }
          i = j max (i + 1)
        case _ => i += 1 // numbers, names, delimiters between tokens
      }
    }
    sb.toString
  }

  /** PDF literal string: balanced parens, backslash escapes, \ddd octal. */
  private def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1
              var v = 0
              while (j < s.length && j < i + 4 &&
                s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb.append((v & 0xff).toChar); i = j
            case '\n' => i += 2 // line continuation
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case ch => sb.append(ch); i += 1
      }
    }
    (sb.toString, i)
  }

  private def hexString(hex: String): String = {
    val clean = hex.filterNot(_.isWhitespace)
    val padded = if (clean.length % 2 == 1) clean + "0" else clean
    padded.grouped(2).map(h =>
      Integer.parseInt(h, 16).toChar).mkString
  }
}

/** [[ExternalIngestion.TiskTextService]] over a directory of downloaded
  * print PDFs (`{baseDir}/{period}/t{ct}.pdf` — the Downloader's layout
  * for S1-fetched artifacts). Extraction runs DISTRIBUTED: Spark's
  * `binaryFile` source partitions the files across executors and
  * [[PdfText.extract]] maps each file's bytes where they were read — no
  * driver-side byte hauling, so a period with thousands of prints scales
  * with the cluster like any other scan.
  */
class PdfDirTexts(baseDir: String)
    extends ExternalIngestion.TiskTextService {

  private val CtRe = """t(\d+)\.pdf$""".r

  override def texts(spark: org.apache.spark.sql.SparkSession,
      period: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Paths.get(baseDir, period.toString)
    if (!java.nio.file.Files.isDirectory(dir))
      return Seq.empty[(Int, Int, String)].toDF("period", "ct", "text")
    val re = CtRe
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(dir.toString)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        re.findFirstMatchIn(path).map(m =>
          (period, m.group(1).toInt, PdfText.extract(bytes)))
      }
      .toDF("period", "ct", "text")
  }

  override def hasText(period: Int, ct: Int): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(baseDir, period.toString, s"t$ct.pdf"))
}
