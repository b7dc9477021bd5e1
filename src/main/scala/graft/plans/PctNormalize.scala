package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2.2 percent-encoding normalization as a native codegen
  * expression: percent-encodings of UNRESERVED characters (ALPHA / DIGIT /
  * `-` / `.` / `_` / `~`) decode to the literal character, every other
  * valid triplet keeps its encoding with the hex digits uppercased, and
  * anything that is not a valid triplet (`%G1`, a trailing `%7`) passes
  * through byte-for-byte. Reserved delimiters (`%2F`, `%26`, `%3D`, …)
  * are deliberately NEVER decoded — decoding them would change where the
  * URL's components begin and end (§2.2), turning one path segment into
  * two or splitting a query value.
  *
  * The transformation is context-free over the string (a triplet
  * normalizes the same way in host, path, or query), so
  * [[graft.functions.UrlNorm.canonicalUrl]] applies it once to the whole
  * URL before splitting components: `%7Euser` and `~user` become one
  * dedup key while `a%2Fb` stays distinct from `a/b`.
  *
  * A regex chain cannot express this cross-engine (neither Java regex nor
  * RE2 can uppercase or map a captured group), hence a native expression —
  * the [[NfcNormalize]] precedent; the oracle side plants closed-form
  * variants instead of replaying the algorithm.
  */
case class PctNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "pct_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PctNormalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.PctNormalize.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): PctNormalize =
    copy(child = newChild)
}

object PctNormalize {

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  /** Static entry shared by the interpreted eval and the generated code. */
  def normalize(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s // fast path: nothing encoded
    val out = new java.lang.StringBuilder(s.length)
    out.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n) {
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h >= 0 && l >= 0) {
          val b = (h << 4) | l
          if (isUnreserved(b)) out.append(b.toChar)
          else out.append('%')
            .append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { out.append(c); i += 1 } // %XY with bad hex: untouched
      } else { out.append(c); i += 1 }   // incl. a trailing % or %7
    }
    out.toString
  }
}
