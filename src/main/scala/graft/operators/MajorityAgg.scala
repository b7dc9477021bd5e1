package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass typed Aggregator for the A1 majority direction — the
  * reference's hottest aggregate (`loyalty_service.py:37-52`) as ONE
  * custom aggregation function: yes/no counts accumulate in a typed
  * buffer and the tie logic lives in `finish`, instead of two `sum(when)`
  * columns plus a `when` chain plus a null filter.
  *
  * This is the SURVEY §2.11 "optional polish" path, kept alongside (not
  * replacing) `Majority.majorityDirection`: the `sum(when)` formulation
  * is fully codegen'd and is what the catalog queries use; this
  * Aggregator demonstrates the typed-UDAF machinery and is spec-proven to
  * produce identical groups. Like any Aggregator it runs partial+final
  * (map-side combine via `merge`), so it shuffles exactly as much as the
  * built-in formulation.
  */
object MajorityAgg {

  /** Typed accumulation buffer. */
  case class Counts(yes: Long, no: Long)

  /** Returns the majority code, or null on a tie / no active votes —
    * callers drop null groups exactly like `Majority.majorityDirection`.
    */
  class MajorityDirection(yesCode: String, noCode: String)
      extends Aggregator[String, Counts, String] {
    override def zero: Counts = Counts(0L, 0L)
    override def reduce(b: Counts, code: String): Counts =
      if (code == yesCode) b.copy(yes = b.yes + 1L)
      else if (code == noCode) b.copy(no = b.no + 1L)
      else b
    override def merge(a: Counts, b: Counts): Counts =
      Counts(a.yes + b.yes, a.no + b.no)
    override def finish(c: Counts): String =
      if (c.yes > c.no) yesCode
      else if (c.no > c.yes) noCode
      else null
    override def bufferEncoder: Encoder[Counts] = Encoders.product[Counts]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** The aggregator as an untyped column function for `groupBy(...).agg`. */
  def majorityDirectionUdaf(codeCol: Column,
      yesCode: String = "A", noCode: String = "B"): Column =
    udaf(new MajorityDirection(yesCode, noCode), Encoders.STRING)(codeCol)
}
