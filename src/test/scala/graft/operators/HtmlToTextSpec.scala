package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlToTextSpec extends SparkSpec {

  private def clean(html: String): String = {
    val session = spark
    import session.implicits._
    Seq(html).toDF("h")
      .select(TextAnalysis.htmlToText(col("h")).as("c"))
      .collect().head.getString(0)
  }

  test("strips script/style/comment blocks and tags, decodes entities, " +
      "collapses whitespace") {
    val html = """<html><head><title>T</title>
      |<style>body { margin: 0 }</style>
      |<script type="text/javascript">if (1 < 2) { x(); }</script>
      |</head><body><!-- hidden -->
      |<h1>Hello &amp; welcome</h1>
      |<p class="a">line&nbsp;one &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>
      |</body></html>""".stripMargin
    assert(clean(html) ==
      "T Hello & welcome line one <tag> \"q\" 's'")
  }

  test("&amp;lt; decodes to the LITERAL &lt; (single-pass, no rescan) " +
      "and multiline script bodies vanish") {
    assert(clean("<p>a &amp;lt; b</p>") == "a &lt; b")
    // the numeric spelling of & follows the same no-rescan rule
    assert(clean("<p>a &#38;lt; b</p>") == "a &lt; b")
    assert(clean("<script>\nvar s = '<p>not text</p>';\n</script>ok") == "ok")
    assert(clean("plain text without markup") == "plain text without markup")
  }

  test("numeric references decode in decimal and hex, incl. beyond the " +
      "BMP; named references cover Latin-1 and typography") {
    assert(clean("<p>&#269;&#x10D; &#233;&#xE9;&#XE9;</p>") == "čč ééé")
    assert(clean("<p>&eacute;&mdash;&hellip;&szlig;&euro;&copy;</p>")
      == "é—…ß€©")
    // astral plane: U+1F600 via decimal and hex
    assert(clean("<p>&#128512;&#x1F600;</p>") == "😀😀")
  }

  test("invalid references pass through byte-for-byte: unknown names, " +
      "surrogates, zero, out-of-range, bad digits, missing semicolon") {
    assert(clean("<p>&zzz; &#xD800; &#0; &#1114112; &#xG1; &#; &amp</p>")
      == "&zzz; &#xD800; &#0; &#1114112; &#xG1; &#; &amp")
    // a ; too far from its & is never ours
    assert(clean("<p>fish &chips and more; stuff</p>")
      == "fish &chips and more; stuff")
  }

  test("htmlToTextLines: block boundaries become lines, inline tags do " +
      "not, blank-line runs fold, per-line whitespace collapses — and " +
      "htmlToText's flattening really loses the structure") {
    val session = spark
    import session.implicits._
    def lines(html: String): String =
      Seq(html).toDF("h")
        .select(TextAnalysis.htmlToTextLines(col("h")).as("c"))
        .collect().head.getString(0)
    val html = "<html><body><h1>Title here.</h1>" +
      "<p>First  para with <b>inline</b> bold.</p>" +
      "<div>Second   block.</div><ul><li>item one.</li>" +
      "<li>item two.</li></ul><p>Tail&nbsp;para.</p></body></html>"
    assert(lines(html) ==
      "Title here.\nFirst para with inline bold.\nSecond block.\n" +
        "item one.\nitem two.\nTail para.")
    // <br> breaks too; empty blocks fold to a single newline
    assert(lines("<p>a.</p><p></p><p></p><p>b.</p>") == "a.\nb.")
    assert(lines("x<br>y<br/>z") == "x\ny\nz")
    // br is a full tag NAME, not a prefix: attribute and self-closing
    // forms break, but tags merely starting with "br" stay inline
    assert(lines("x<br class=\"a\">y<br />z") == "x\ny\nz")
    assert(lines("<p>a <breadcrumb>b</breadcrumb> c<broken>d</p>")
      == "a b c d")
    // the flat extractor really is line-free on the same input
    assert(!clean(html).contains("\n"))
    // the line extractor feeds the line rules: this page survives C4
    val page = Seq(1L -> lines(
      "<p>This is a proper opening sentence for the page.</p>" +
        "<p>Here is a second proper sentence for the page.</p>" +
        "<p>And here is a third proper sentence for it.</p>"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilters(page, "text").collect().head
    assert(out.getAs[Boolean]("page_keep") &&
      out.getAs[Long]("n_kept") == 3L)
  }
}
