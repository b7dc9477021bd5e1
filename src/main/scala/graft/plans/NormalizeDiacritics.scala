package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextNorm

/** Native Catalyst expression for diacritic stripping (reference parity with
  * `utils/text.py:6-14`, minus the lowercase which callers compose with
  * `lower()`). Codegen-capable: participates in whole-stage codegen instead
  * of the UDF serialization path, so a search predicate
  * `lower(strip_diacritics(col)) LIKE '%q%'` stays inside one generated
  * stage at scan time and the filter can run on 100 TB without row-at-a-time
  * boxing.
  */
case class NormalizeDiacritics(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_diacritics"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextNorm.stripDiacritics(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextNorm.stripDiacritics($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeDiacritics =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native codegen expression — the
  * standard first text-cleaning step in corpus pipelines (combining
  * sequences fold to their canonical composed form, so "e"+U+0301 and
  * "é" hash/compare/dedupe identically). `java.text.Normalizer` is
  * JDK-built-in; DuckDB's `nfc_normalize` is the oracle counterpart,
  * which keeps the operator hash-exactly checkable cross-engine.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Exact difflib.SequenceMatcher ratio as a native binary expression (fuzzy
  * name-match join, reference `submitter_resolver.py:16-91`).
  */
case class FuzzyRatio(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "fuzzy_ratio"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextNorm.sequenceMatcherRatio(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextNorm.sequenceMatcherRatio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FuzzyRatio =
    copy(left = l, right = r)
}
