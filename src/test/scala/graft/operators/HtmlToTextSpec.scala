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

  test("&amp;lt; decodes to the LITERAL &lt; (single decode, standard " +
      "order) and multiline script bodies vanish") {
    assert(clean("<p>a &amp;lt; b</p>") == "a &lt; b")
    assert(clean("<script>\nvar s = '<p>not text</p>';\n</script>ok") == "ok")
    assert(clean("plain text without markup") == "plain text without markup")
  }
}
