package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Streaming slice (SURVEY §2.12): the reference has no stream engine (its
  * "incremental" behavior is a 30 s parquet-mtime poll,
  * `services/data_reader.py:390-475`); Structured Streaming replaces it.
  * Windowed aggregations over the `events` table with watermarked
  * late-data handling; the same transform runs identically over a batch
  * DataFrame (used by the correctness harness) and a `readStream` source.
  */
object EventWindows {

  /** Tumbling-window counts+sums per event_type. Works on batch or
    * streaming input (same unresolved plan).
    */
  def tumblingCounts(events: DataFrame, windowLen: String): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window distinct-user activity. */
  def slidingUserCounts(events: DataFrame, windowLen: String, slide: String): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLen, slide).as("w"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("approx_users"), col("n"))

  /** Streaming exact deduplication — the streaming analog of
    * `Dedup.exactDedup`: keep the first event per key, with state PRUNED
    * past the watermark (`dropDuplicatesWithinWatermark`), so state size
    * is bounded by the watermark horizon × key arrival rate instead of
    * growing with the whole stream — the property that makes exact dedup
    * viable on an unbounded 100 TB/day feed.
    */
  def dedupWithinWatermark(
      events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join (click-to-signup attribution shape): each
    * left event joins right events with the same key at-or-before it,
    * within `maxAge`. Both sides watermarked; the time-bound condition is
    * what lets Spark expire right-side state — an UNBOUNDED as-of would
    * keep every right row forever.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      maxAge: String, watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"r.$rightTs <= l.$leftTs AND " +
        s"r.$rightTs >= l.$leftTs - INTERVAL $maxAge"))
  }

  /** File-source streaming refresh replacing the reference's mtime watcher
    * (S8): watch a parquet directory, maintain an always-current temp view
    * via foreachBatch. `onRefresh` runs after each refresh — the serving
    * layer hooks cache invalidation here (the reference's
    * `data_reader.py:444` drops the analysis cache when the watcher sees
    * new parquet; pass e.g. `() => server.invalidatePeriod(p)` or a full
    * `cache.invalidatePrefix("")`).
    */
  def watchParquetDir(
      spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      viewName: String,
      onRefresh: () => Unit = () => ()): DataStreamWriter[Row] =
    spark.readStream
      .schema(schema)
      .parquet(dir)
      .writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: DataFrame, _: Long) =>
        // refresh on the OUTER session — foreachBatch runs in a cloned
        // session whose temp views are invisible to the serving session
        spark.read.parquet(dir).createOrReplaceTempView(viewName)
        onRefresh()
      }
}
