package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile bucketing with an explicit scale dispatch.
  *
  * The exact formulation (NTILE over a single unpartitioned window) is a
  * total sort into ONE partition — the correct oracle semantics, and a
  * driver-adjacent scale-killer at 100×. The scale path computes n-1
  * approximate quantile cuts (Greenwald-Khanna via
  * `DataFrame.stat.approxQuantile` — a bounded driver result of n-1
  * doubles at ANY input size) and assigns buckets with a codegen
  * expression, so the plan is scan + hash-aggregate, no global sort.
  *
  * Divergence between the paths, documented: NTILE buckets are
  * equal-COUNT (ties split by the tiebreak order); approx buckets are
  * value-range buckets with approximately equal counts — boundaries can
  * shift by `relErr` × rows, and heavily duplicated values stay in one
  * bucket. Callers needing bit-exact NTILE (the DuckDB oracle) pass
  * `exact = Some(true)`.
  */
object Quantiles {

  /** Per-bucket (bucket, n, min_value, max_value), dispatched on the
    * source size estimate like [[Dedup.autoBroadcastSets]]: under the
    * threshold → exact NTILE; over it → approx-quantile cuts.
    */
  def bucketStats(
      df: DataFrame, valueCol: String, tiebreak: Column, buckets: Int,
      exact: Option[Boolean] = None, relErr: Double = 1e-4,
      exactMaxBytes: Long = 256L << 20): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    val useExact = exact.getOrElse(
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(exactMaxBytes))
    if (useExact) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col(valueCol).asc, tiebreak)
      df.withColumn("bucket", ntile(buckets).over(w))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          min(col(valueCol)).as("min_value"),
          max(col(valueCol)).as("max_value"))
        .orderBy("bucket")
    } else {
      val cuts = df.stat.approxQuantile(
        valueCol, (1 until buckets).map(_.toDouble / buckets).toArray, relErr)
      df.withColumn("bucket", bucketOf(col(valueCol), cuts))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          min(col(valueCol)).as("min_value"),
          max(col(valueCol)).as("max_value"))
        .orderBy("bucket")
    }
  }

  /** Codegen bucket assignment: 1 + |{cuts below the value}|. */
  def bucketOf(value: Column, cuts: Array[Double]): Column =
    cuts.map(c => when(value > lit(c), 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
}
