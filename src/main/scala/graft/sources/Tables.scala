package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness test tables (`/root/testdata/sf*`). At cluster
  * scale these would be catalog tables partitioned by date; here they are
  * one parquet file per table. The only normalization applied is the
  * `events.ts` nanosecond handling (parquet TIMESTAMP(NANOS) is not a
  * Spark-readable logical type — read as long, truncate to microseconds,
  * matching DuckDB's nanos→micros truncation).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** events.parquet carries TIMESTAMP(NANOS). Spark refuses the logical
    * type unless `spark.sql.legacy.parquet.nanosAsLong=true`, under which
    * `ts` arrives as LongType nanos — convert to a true TimestampType
    * truncated to micros (identical to DuckDB's read of the same file).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    val tsType = raw.schema("ts").dataType
    if (tsType == org.apache.spark.sql.types.LongType)
      // integer division — `/` would go through double and lose precision
      // on epoch-nano magnitudes
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
