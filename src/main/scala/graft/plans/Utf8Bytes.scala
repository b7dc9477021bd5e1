package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** The UTF-8 byte sequence of a string as `array<int>` (each element
  * 0–255), as a native codegen expression — the primitive under byte-
  * fallback tokenization ([[graft.operators.Bpe.applyModel]]'s
  * `oov=bytes` mode, the GPT-2 byte-level idea: any word, in any
  * script, decomposes into at most 4·|chars| known ids, so no text is
  * ever dropped or collapsed to UNK).
  *
  * Why an expression and not `transform(split(w, ''), ...)`: Spark
  * strings split by UTF-16 code units, so a supplementary-plane
  * character (emoji, rare CJK) splits into two lone surrogates and
  * per-character arithmetic would emit CESU-8, not UTF-8. The
  * engine-internal [[UTF8String]] payload IS the UTF-8 encoding —
  * this expression just exposes those bytes, which is also why it is
  * allocation-bounded (one int array per value) and codegen-friendly
  * (a single static call inside the generated stage, no boxing loop).
  * The DuckDB oracle counterpart derives the same bytes from code
  * points with the standard UTF-8 arithmetic (RFC 3629), which keeps
  * byte-fallback tokenization hash-exactly checkable cross-engine.
  */
case class Utf8Bytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "utf8_bytes"

  override protected def nullSafeEval(input: Any): Any =
    Utf8Bytes.bytesOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Utf8Bytes.bytesOf($c)")

  override protected def withNewChildInternal(newChild: Expression): Utf8Bytes =
    copy(child = newChild)
}

object Utf8Bytes {
  /** Static helper shared by eval and generated code. */
  def bytesOf(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i) & 0xff; i += 1 }
    new GenericArrayData(out)
  }
}
