package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Period-partitioned parquet store (SURVEY §4: the reference shards by
  * filename suffix `hl_hlasovani_{period}.parquet`; the cluster-scale
  * equivalent is `partitionBy("period")` so per-period queries read ONLY
  * that partition's files — partition pruning shows up as
  * `PartitionFilters` in the scan and matters enormously at 100 TB /
  * 10 periods).
  */
object PeriodStore {

  /** Write one table's per-period DataFrames as a period-partitioned
    * parquet dataset.
    */
  def write(perPeriod: Seq[(Int, DataFrame)], path: String): Unit = {
    perPeriod.map { case (p, df) => df.withColumn("period", lit(p)) }
      .reduce(_ unionByName _)
      .write.mode("overwrite").partitionBy("period").parquet(path)
  }

  /** Read one period — the filter is a partition predicate, pruned at
    * planning time (never touches other periods' files).
    */
  def readPeriod(spark: SparkSession, path: String, period: Int): DataFrame =
    spark.read.parquet(path).filter(col("period") === period)
}
