package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

import graft.SparkSpec

/** Golden-PDF fixture spec for the S9 extraction stage: a two-page PDF is
  * built byte-for-byte (catalog → page tree → Flate + plain content
  * streams, literal/octal/hex strings, TJ kerning arrays) and must come
  * back as the reference's `"\n\n"` page-joined text
  * (`services/tisk/version_service.py:123-143`). Network-free.
  */
class PdfTextSpec extends SparkSpec {

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes(ISO_8859_1)); d.finish()
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Minimal valid-enough PDF: page 1 Flate-compressed with octal Czech
    * accents, page 2 uncompressed with a TJ array + hex string.
    */
  private def goldenPdf(): Array[Byte] = {
    val content1 = "BT /F1 12 Tf 72 720 Td (Zpr\\341va o v\\375sledku) Tj " +
      "0 -14 Td (dalsi radek) Tj ET"
    val c1 = deflate(content1)
    val content2 = "BT (Page two:) Tj 0 -12 Td [(Hel) -30 (lo)] TJ ( ) Tj " +
      "<486578> Tj ET"
    val c2 = content2.getBytes(ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} /Filter /FlateDecode >> stream\n")
    out.write(c1)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${c2.length} >> stream\n")
    out.write(c2)
    w("\nendstream endobj\n")
    w("%%EOF\n")
    out.toByteArray
  }

  test("golden PDF extracts page text in order, pages joined with \\n\\n") {
    val text = PdfText.extract(goldenPdf())
    assert(text ==
      "Zpráva o výsledku\ndalsi radek\n\nPage two:\nHello Hex",
      s"got: ${text.replace("\n", "\\n")}")
  }

  test("indirect multi-digit /Length takes the endstream fallback, not a " +
      "backtracked bogus direct length") {
    // `/Length 10 0 R`: the greedy digit group must not retry "1" (which
    // would slice the stream to ~1 byte and extract empty text) — the
    // (?!\d) guard forbids splitting the number, so directLength is None
    // and the endstream fallback recovers the full content stream.
    val content = "BT (Indirect length page) Tj ET"
    val c = content.getBytes(ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w("4 0 obj << /Length 10 0 R >> stream\n")
    out.write(c)
    w("\nendstream endobj\n")
    w(s"10 0 obj ${c.length} endobj\n")
    w("%%EOF\n")
    val text = PdfText.extract(out.toByteArray)
    assert(text == "Indirect length page",
      s"got: ${text.replace("\n", "\\n")}")
  }

  test("degenerate inputs degrade to empty text, never an exception") {
    assert(PdfText.extract(Array.emptyByteArray) == "")
    assert(PdfText.extract("not a pdf at all".getBytes(ISO_8859_1)) == "")
    // truncated stream: object scan survives, bad page yields no text
    val truncated = goldenPdf().take(120)
    assert(PdfText.extract(truncated) != null)
  }

  test("PdfDirTexts serves the TiskTextService boundary over a PDF " +
      "directory, distributed via the binaryFile source") {
    val base = java.nio.file.Files.createTempDirectory("pdftexts").toFile
    try {
      val periodDir = new java.io.File(base, "1")
      periodDir.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(periodDir, "t100.pdf").toPath, goldenPdf())
      java.nio.file.Files.write(
        new java.io.File(periodDir, "t205.pdf").toPath, goldenPdf())
      // a non-matching filename is ignored, not an error
      java.nio.file.Files.write(
        new java.io.File(periodDir, "notes.pdf").toPath,
        "junk".getBytes(ISO_8859_1))

      val svc = new PdfDirTexts(base.getAbsolutePath)
      assert(svc.hasText(1, 100) && svc.hasText(1, 205) && !svc.hasText(1, 7))
      val rows = svc.texts(spark, 1).collect()
        .map(r => r.getAs[Int]("ct") -> r.getAs[String]("text")).toMap
      assert(rows.keySet == Set(100, 205))
      assert(rows(100).startsWith("Zpráva o výsledku"))
      assert(rows(100).contains("\n\nPage two:"))
      // an unknown period serves an empty, correctly-shaped relation
      assert(svc.texts(spark, 9).isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(base)
    }
  }
}
