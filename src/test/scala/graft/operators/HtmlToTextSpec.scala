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
}
