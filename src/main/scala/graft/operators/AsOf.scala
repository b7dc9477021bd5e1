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
    * @param payload   right-side columns to carry (renamed as given)
    */
  def asofBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // 0 = right (sorts first on ts ties -> inclusive), 1 = left
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__tag")) ++
        payload.map { case (from, to) => col(from).as(s"__p_$to") } : _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__tag")) ++
        payload.map { case (_, to) => lit(null).as(s"__p_$to") } ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) : _*)
    val unioned = taggedRight
      .select((taggedLeft.columns.map { c =>
        if (taggedRight.columns.contains(c)) col(c)
        else lit(null).cast(taggedLeft.schema(c).dataType).as(c)
      }).toSeq: _*)
      .unionByName(taggedLeft)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.values.foldLeft(unioned) { (df, to) =>
      df.withColumn(s"__c_$to",
        last(when(col("__tag") === 0, col(s"__p_$to")), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftCols.filterNot(c => keys.contains(c) || c == leftTs)
            .map(c => col(s"__l_$c").as(c)) ++
          payload.values.map(to => col(s"__c_$to").as(to)) : _*)
  }
}
