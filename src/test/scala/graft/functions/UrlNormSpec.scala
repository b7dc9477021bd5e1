package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlNormSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlNorm.canonicalUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("RFC 3986 syntax normalization: case, default ports, empty path, " +
      "trailing slash, fragment") {
    assert(canon("HTTPS://Example.COM:443/A/b/") == Seq("https://example.com/A/b"))
    assert(canon("http://example.com:80") == Seq("http://example.com/"))
    // non-default port survives; http's default isn't https's
    assert(canon("https://example.com:80/x") == Seq("https://example.com:80/x"))
    assert(canon("https://example.com/x#frag") == Seq("https://example.com/x"))
    // root slash stays; ONE trailing slash stripped elsewhere
    assert(canon("https://example.com/") == Seq("https://example.com/"))
    // path case is significant (only scheme+host fold)
    assert(canon("https://example.com/CaseSensitive")
      == Seq("https://example.com/CaseSensitive"))
  }

  test("utm_* params are stripped wherever they sit; other params and " +
      "their order survive") {
    assert(canon("https://e.com/p?utm_source=x") == Seq("https://e.com/p"))
    assert(canon("https://e.com/p?utm_source=x&id=7")
      == Seq("https://e.com/p?id=7"))
    assert(canon("https://e.com/p?id=7&utm_campaign=z")
      == Seq("https://e.com/p?id=7"))
    assert(canon("https://e.com/p?utm_a=1&id=7&utm_b=2&z=3")
      == Seq("https://e.com/p?id=7&z=3"))
    assert(canon("https://e.com/p?b=2&a=1") == Seq("https://e.com/p?b=2&a=1"))
    // GA4 params contain underscores (utm_source_platform etc.)
    assert(canon("https://e.com/p?utm_source_platform=web&id=7")
      == Seq("https://e.com/p?id=7"))
    assert(canon("https://e.com/p?utm_marketing_tactic=x")
      == Seq("https://e.com/p"))
  }

  test("userinfo keeps its case (RFC 3986: only scheme and host fold)") {
    assert(canon("https://Alice@Example.COM/x")
      == Seq("https://Alice@example.com/x"))
    assert(canon("https://alice@example.com/x")
      == Seq("https://alice@example.com/x"))
  }

  test("utm strips cover digit-bearing names and valueless params") {
    assert(canon("https://e.com/p?utm_id_2=x&id=7") == Seq("https://e.com/p?id=7"))
    assert(canon("https://e.com/p?utm_x&id=7") == Seq("https://e.com/p?id=7"))
    assert(canon("https://e.com/p?id=7&utm_x") == Seq("https://e.com/p?id=7"))
    assert(canon("https://e.com/p?utm_abc123") == Seq("https://e.com/p"))
    // near-miss names survive: utm needs its underscore, and the match
    // anchors at a param boundary
    assert(canon("https://e.com/p?utm=1&xutm_a=2")
      == Seq("https://e.com/p?utm=1&xutm_a=2"))
    // a name continuing with chars OUTSIDE the class is NOT a utm param:
    // the whole param must survive (a bare-prefix strip would corrupt it
    // to '-platform=x' and falsely collide distinct URLs)
    assert(canon("https://e.com/p?utm_source-platform=x")
      == Seq("https://e.com/p?utm_source-platform=x"))
    // adjacent utm params don't hide each other behind a consumed '&'
    assert(canon("https://e.com/p?utm_a&utm_b&utm_c&id=1")
      == Seq("https://e.com/p?id=1"))
    assert(canon("https://e.com/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4")
      == Seq("https://e.com/p"))
  }

  test("percent-encoding normalizes per RFC 3986 6.2.2.2: unreserved " +
      "decode, reserved keep uppercase hex, junk triplets untouched") {
    // unreserved: ALPHA / DIGIT / - . _ ~ decode to the literal
    assert(canon("https://e.com/%7Euser") == Seq("https://e.com/~user"))
    assert(canon("https://e.com/%7euser") == Seq("https://e.com/~user"))
    assert(canon("https://e.com/%41%7a%30%2D%2e%5F")
      == Seq("https://e.com/Az0-._"))
    // the three spellings of ~ collapse to ONE dedup key
    assert(canon("https://e.com/~u", "https://e.com/%7Eu", "https://e.com/%7eu")
      .toSet.size == 1)
    // reserved delimiters are NEVER decoded (decoding %2F would change
    // the path's segment structure) — hex just uppercases
    assert(canon("https://e.com/a%2Fb") == Seq("https://e.com/a%2Fb"))
    assert(canon("https://e.com/a%2fb") == Seq("https://e.com/a%2Fb"))
    assert(canon("https://e.com/p?a=1%262") == Seq("https://e.com/p?a=1%262"))
    assert(canon("https://e.com/p?a=%3d") == Seq("https://e.com/p?a=%3D"))
    // non-hex after % and truncated triplets pass through byte-for-byte
    assert(canon("https://e.com/%G1/%7") == Seq("https://e.com/%G1/%7"))
    // an encoded underscore un-hides a utm param from the strip
    assert(canon("https://e.com/p?utm%5Fsource=x&id=7")
      == Seq("https://e.com/p?id=7"))
  }

  test("non-URLs pass through unchanged") {
    assert(canon("not a url", "mailto:x@y.cz")
      == Seq("not a url", "mailto:x@y.cz"))
  }
}
