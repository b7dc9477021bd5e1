package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark has no native form
  * for. Implemented the scale-correct way: tag + union both sides, ONE
  * shuffle on (keys, ts), and a running `last(..., ignoreNulls)` window
  * carries the most recent right-side payload forward onto each left row.
  * No point-in-interval explosion, no per-row subquery; cost is a single
  * sort-within-partitions of |left| + |right|.
  *
  * The carried payload is ONE struct per right row — so a right row whose
  * payload fields are genuinely NULL still "wins" as the most recent
  * match (the struct itself is non-null), and multi-column payloads are
  * never mixed across different right rows.
  *
  * Tie semantics: a right row at exactly the left row's timestamp MATCHES
  * (inclusive, `right.ts <= left.ts`) — the right row sorts before the
  * left row at equal ts via the tag ordering.
  */
object AsOf {

  /** @param left      probe side (keeps all rows — left as-of join)
    * @param right     build side whose latest-at-or-before row is attached
    * @param keys      equality keys (e.g. user_id)
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payload   right-side columns to carry: from-name → out-name
    */
  def asofBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Map[String, String]): DataFrame = {
    val reserved = (left.columns ++ right.columns)
      .filter(c => c.startsWith("__"))
    require(reserved.isEmpty,
      s"asofBackward reserves __-prefixed column names internally; " +
        s"rename input columns: ${reserved.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(
      payload.map { case (from, to) => col(from).as(to) }.toSeq: _*)
    // 0 = right (sorts first on ts ties -> inclusive), 1 = left
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__tag") :+
        payloadStruct.as("__p")): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__tag") :+
        lit(null).as("__p")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val unioned = taggedRight
      .select(taggedLeft.columns.toSeq.map { c =>
        if (taggedRight.columns.contains(c)) col(c)
        else lit(null).cast(taggedLeft.schema(c).dataType).as(c)
      }: _*)
      .unionByName(taggedLeft.withColumn("__p",
        col("__p").cast(taggedRight.schema("__p").dataType)))
    // __p as the final sort key: when several right rows share (keys, ts)
    // the carried payload is the struct-wise MAX of the tied payloads —
    // deterministic under any partitioning (without it, `last` picks
    // whichever tied row the shuffle happened to order last). The __tag
    // key still dominates, so left-vs-right ordering is unchanged.
    // Non-orderable payload types (maps) can't be a sort key — those fall
    // back to the tie-arbitrary pre-fix behavior rather than throwing.
    val payloadOrderable = payload.keys.forall { c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType)
    }
    val tieKeys = Seq(col("__ts").asc, col("__tag").asc) ++
      (if (payloadOrderable) Seq(col("__p").asc_nulls_first) else Nil)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tieKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the WHOLE struct of the latest right row (never mixes rows,
    // and NULL payload fields don't fall through to older rows)
    val carried = unioned.withColumn("__c",
      last(when(col("__tag") === 0, col("__p")), ignoreNulls = true).over(w))
    carried.filter(col("__tag") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftCols.filterNot(c => keys.contains(c) || c == leftTs)
            .map(c => col(s"__l_$c").as(c)) ++
          payload.values.map(to => col("__c").getField(to).as(to)): _*)
  }
}
