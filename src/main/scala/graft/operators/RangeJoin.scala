package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join with bin blocking — Spark plans a raw
  * `p BETWEEN start AND end` theta join as BroadcastNestedLoop (O(n·m)).
  * Binning maps each point to one bucket and each interval to every
  * bucket it overlaps; the join becomes an equi-join on bucket + an exact
  * containment filter. With `binWidth` ≈ typical interval length each
  * interval lands in ~2 buckets, so the candidate count is ~2·|points|
  * instead of |points|·|intervals|.
  */
object RangeJoin {

  /** @param points     DataFrame with a numeric/epoch point column
    * @param intervals  DataFrame with numeric/epoch [startCol, endCol)
    * @param binWidth   bucket width in the same units
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals
      .withColumn("__bin_start", floor(col(startCol) / binWidth).cast("long"))
      .withColumn("__bin_end", floor(col(endCol) / binWidth).cast("long"))
      .withColumn("__bin",
        explode(sequence(col("__bin_start"), col("__bin_end"))))
      .drop("__bin_start", "__bin_end")
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
