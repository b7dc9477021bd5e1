package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding as a native codegen expression — the
  * entity step of [[graft.operators.TextAnalysis.htmlToText]]. Decodes in
  * ONE left-to-right pass with no rescan, the semantics of a real HTML
  * tokenizer: after `&amp;` decodes to `&` the scan continues PAST it, so
  * `&amp;lt;` yields the literal text `&lt;` — never `<` (a replace-chain
  * cannot express this without double-decoding).
  *
  * Supported references:
  *  - numeric decimal `&#233;` and hex `&#xE9;`/`&#XE9;` for any valid
  *    Unicode scalar value (1..0x10FFFF excluding surrogates) — covers
  *    the long tail real crawls are full of (typography, Czech háčky);
  *  - the HTML4 named set that matters in practice: the XML five, the
  *    Latin-1 block (`&eacute;`, `&szlig;`, …) and common typography
  *    (`&mdash;`, `&hellip;`, `&euro;`, …).
  *
  * Anything else — unknown names, bad digits, out-of-range or surrogate
  * code points, a `&` with no `;` in reach, HTML5's semicolon-less legacy
  * forms — passes through byte-for-byte: a corpus cleaner must never
  * destroy text it cannot interpret.
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_entity_decode"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlEntityDecode.decode(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.HtmlEntityDecode.decode($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
}

object HtmlEntityDecode {

  /** HTML4 named references (value = decoded string). The XML five plus
    * Latin-1 plus common typography/currency — the set a crawled-corpus
    * cleaner actually meets; spec-complete HTML5 (2 231 names) is out of
    * scope and unknown names pass through.
    */
  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    val pairs = Seq(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
      "nbsp" -> " ", "iexcl" -> "¡", "cent" -> "¢",
      "pound" -> "£", "curren" -> "¤", "yen" -> "¥",
      "brvbar" -> "¦", "sect" -> "§", "uml" -> "¨",
      "copy" -> "©", "ordf" -> "ª", "laquo" -> "«",
      "not" -> "¬", "shy" -> "­", "reg" -> "®",
      "macr" -> "¯", "deg" -> "°", "plusmn" -> "±",
      "sup2" -> "²", "sup3" -> "³", "acute" -> "´",
      "micro" -> "µ", "para" -> "¶", "middot" -> "·",
      "cedil" -> "¸", "sup1" -> "¹", "ordm" -> "º",
      "raquo" -> "»", "frac14" -> "¼", "frac12" -> "½",
      "frac34" -> "¾", "iquest" -> "¿", "times" -> "×",
      "divide" -> "÷", "szlig" -> "ß",
      "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â",
      "Atilde" -> "Ã", "Auml" -> "Ä", "Aring" -> "Å",
      "AElig" -> "Æ", "Ccedil" -> "Ç", "Egrave" -> "È",
      "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
      "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î",
      "Iuml" -> "Ï", "ETH" -> "Ð", "Ntilde" -> "Ñ",
      "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocirc" -> "Ô",
      "Otilde" -> "Õ", "Ouml" -> "Ö", "Oslash" -> "Ø",
      "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucirc" -> "Û",
      "Uuml" -> "Ü", "Yacute" -> "Ý", "THORN" -> "Þ",
      "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
      "atilde" -> "ã", "auml" -> "ä", "aring" -> "å",
      "aelig" -> "æ", "ccedil" -> "ç", "egrave" -> "è",
      "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
      "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î",
      "iuml" -> "ï", "eth" -> "ð", "ntilde" -> "ñ",
      "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
      "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø",
      "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
      "uuml" -> "ü", "yacute" -> "ý", "thorn" -> "þ",
      "yuml" -> "ÿ",
      "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘",
      "rsquo" -> "’", "sbquo" -> "‚", "ldquo" -> "“",
      "rdquo" -> "”", "bdquo" -> "„", "dagger" -> "†",
      "Dagger" -> "‡", "bull" -> "•", "hellip" -> "…",
      "permil" -> "‰", "prime" -> "′", "Prime" -> "″",
      "lsaquo" -> "‹", "rsaquo" -> "›", "oline" -> "‾",
      "euro" -> "€", "trade" -> "™")
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** Longest supported reference body is 6 chars + `#x` + 6 hex digits;
    * a `;` further than this from its `&` is never ours.
    */
  private val MaxBody = 9

  /** Static entry shared by the interpreted eval and the generated code. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    out.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        // find the closing ';' within reach
        var semi = -1
        var j = i + 1
        val stop = math.min(n, i + 2 + MaxBody)
        while (semi < 0 && j < stop) {
          if (s.charAt(j) == ';') semi = j
          j += 1
        }
        var decoded: String = null
        if (semi > i + 1) {
          val body = s.substring(i + 1, semi)
          if (body.charAt(0) == '#') {
            val cp =
              if (body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                parseInt(body.substring(2), 16)
              else if (body.length > 1) parseInt(body.substring(1), 10)
              else -1
            if (cp >= 1 && cp <= 0x10ffff && (cp < 0xd800 || cp > 0xdfff))
              decoded = new String(Character.toChars(cp))
          } else decoded = named.get(body)
        }
        if (decoded != null) { out.append(decoded); i = semi + 1 }
        else { out.append('&'); i += 1 } // not a reference we decode
      }
    }
    out.toString
  }

  private def parseInt(digits: String, radix: Int): Int = {
    if (digits.isEmpty) return -1
    var v = 0
    var i = 0
    while (i < digits.length) {
      val d = Character.digit(digits.charAt(i), radix)
      if (d < 0) return -1
      v = v * radix + d
      if (v > 0x10ffff) return -1 // cap before overflow
      i += 1
    }
    v
  }
}
