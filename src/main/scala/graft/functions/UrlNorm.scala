package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the standard first-pass
  * dedup key in large crawled corpora (CCNet / RefinedWeb dedupe by
  * normalized URL before any content hashing): RFC 3986 syntax-based
  * normalization (case of scheme+host, default ports, empty path) plus
  * the conventional tracking-param strip.
  *
  * Pure column expressions (Java-regex/RE2 common subset, like the PII
  * masker) — scan-speed, codegen-friendly, no shuffle; the dedup that
  * follows is one groupBy on the canonical key.
  *
  * Steps, in order:
  *  1. drop the fragment (`#...`),
  *  2. normalize percent-encodings (RFC 3986 §6.2.2.2, the native
  *     [[graft.plans.PctNormalize]] expression): unreserved chars decode
  *     (`%7E` → `~`), everything else keeps its encoding with uppercase
  *     hex (`%2f` → `%2F`, never decoded — reserved delimiters would
  *     change component boundaries); runs BEFORE the query split so an
  *     encoded `utm%5Fsource` is visible to the utm strip,
  *  3. lowercase scheme and host:port — NOT userinfo, which RFC 3986
  *    §6.2.2.1 keeps case-sensitive (path/query case is significant too),
  *  4. strip the scheme's default port (`:80` http, `:443` https),
  *  5. empty path → `/`; otherwise strip ONE trailing slash,
  *  6. remove `utm_*` query params — names may carry digits and
  *     underscores (GA4 `utm_source_platform`, `utm_id_2`), and valueless
  *     `&utm_x` forms strip too — collapsing separator debris,
  *  7. recompose; a string with no `scheme://` is passed through
  *     unchanged (not a URL — garbage in, same garbage out).
  */
object UrlNorm {

  def canonicalUrl(u: Column): Column = {
    val noFrag = graft.plans.GraftFunctions.pctNormalize(
      regexp_replace(u, "#.*$", ""))
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo (through the last @) keeps its case; host:port folds
    val host0 = concat(
      regexp_extract(auth0, "^(.*@)", 1),
      lower(regexp_replace(auth0, "^.*@", "")))
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val after = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path0 = regexp_extract(after, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "(.)/$", "$1"))
    val qs0 = regexp_extract(after, "\\?(.*)$", 1)
    // The strip must only remove a COMPLETE param: without a trailing
    // boundary, `utm_source-platform=x` would lose its bare `utm_source`
    // prefix and corrupt the query ('-' is outside the name class). RE2
    // has no lookahead, so the boundary is consumed + re-emitted — and
    // every '&' is doubled FIRST so adjacent utm params each own a
    // separator on both sides (a consumed '&' otherwise hides the next
    // param from `(^|&)` in the same pass); the debris-collapse below
    // undoes the padding.
    val qs1 = replace(qs0, lit("&"), lit("&&"))
    val qs2 = regexp_replace(qs1,
      "(^|&)utm_[A-Za-z0-9_]+(=[^&]*)?(&|$)", "$1$3")
    val qs3 = regexp_replace(
      regexp_replace(qs2, "&&+", "&"), "^&+|&+$", "")
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), host, path,
        when(qs3 === "", lit("")).otherwise(concat(lit("?"), qs3))))
  }
}
