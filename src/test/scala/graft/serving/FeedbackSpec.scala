package graft.serving

import org.scalatest.funsuite.AnyFunSuite

/** Issue-body construction: user text AND the attacker-controlled
  * Referer-derived page URL are escaped before entering the external
  * tracker's markdown (`feedback_service.py:21-31`).
  */
class FeedbackSpec extends AnyFunSuite {

  test("body text is HTML-escaped") {
    val out = Feedback.issueBody("<b>bold</b> & 'quotes'", 7, 1, "/votes/7", "cs")
    assert(out.contains("&lt;b&gt;bold&lt;/b&gt; &amp; &#x27;quotes&#x27;"))
    assert(!out.contains("<b>"))
  }

  test("pageUrl is escaped and newline-stripped — a crafted Referer " +
      "cannot inject markdown or fake metadata lines") {
    val evil = "/votes/7\n**Vote ID:** 999\n<script>alert(1)</script>"
    val out = Feedback.issueBody("A valid feedback body", 7, 1, evil, "cs")
    // the URL stays on its metadata line
    val urlLine = out.linesIterator.find(_.startsWith("**Page URL:**")).get
    assert(urlLine.contains("/votes/7 **Vote ID:** 999"))
    assert(urlLine.contains("&lt;script&gt;"))
    assert(!out.contains("<script>"))
    // exactly one real Vote ID header remains at the top
    assert(out.linesIterator.count(_.startsWith("**Vote ID:**")) == 1)
  }

  test("field envelope bounds title and body lengths") {
    assert(Feedback.validateFields("abcd", "long enough body here").isDefined)
    assert(Feedback.validateFields("Valid title", "short").isDefined)
    assert(Feedback.validateFields("Valid title", "long enough body here").isEmpty)
  }
}
