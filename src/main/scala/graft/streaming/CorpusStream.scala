package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The incremental corpus-ingest pipeline, end to end — the composition
  * a crawl-fed training-data pipeline actually runs, wired from the
  * operators this library already owns:
  *
  * {{{
  *   WARC segments (arriving)            WarcReader.readStream
  *     → HTTP 200 text/html responses    filter
  *     → visible text                    TextAnalysis.htmlToText
  *     → exact dedup vs ALL prior text   dropDuplicates on fingerprint
  *     → BPE token ids (saved model)     Bpe.applyModel per micro-batch
  *     → parquet (append)
  * }}}
  *
  * Incrementality is carried by two pieces of checkpointed state: the
  * file source's segment discovery log (a landed segment is parsed
  * exactly once — [[graft.sources.WarcReader.readStream]]) and the
  * streaming-aggregation state behind `dropDuplicates` (a document seen
  * in ANY earlier batch never re-emits — restart-safe, because the
  * state store lives in the checkpoint). Tokenization is
  * TRAINING-free at ingest time: the model is learned once offline
  * ([[graft.operators.Bpe.learnMerges]], persisted via `saveModel`)
  * and replayed over each micro-batch's novel documents by
  * [[graft.operators.Bpe.applyModel]] inside `foreachBatch` — the
  * replay is a batch transformation (loop-carried [[graft.operators.Lineage]]
  * cuts), which is exactly what `foreachBatch` exists for.
  *
  * Scale notes: the dedup state holds one 128-bit fingerprint per
  * distinct document ever seen — the same index
  * [[graft.operators.Dedup.incrementalDedup]] maintains relationally;
  * for bounded state on an unbounded crawl, add a watermark and accept
  * windowed (rather than all-time) dedup, or run the batch-side
  * Bloom-prefiltered dedup between drains. `applyModel` per batch
  * touches only that batch's distinct words, so per-drain cost scales
  * with arrival size, not corpus size.
  */
object CorpusStream {

  /** The streaming relation of NOVEL documents: `(url, text, fp)` —
    * parsed, text-extracted, fingerprint-deduplicated against every
    * document any earlier batch emitted (checkpointed state).
    */
  def docStream(
      spark: SparkSession, warcDir: String,
      glob: String = "*.warc*"): DataFrame =
    graft.sources.WarcReader.readStream(spark, warcDir, glob)
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri").as("url"),
        graft.operators.TextAnalysis.htmlToText(
          decode(col("body"), "UTF-8")).as("text"))
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fp")

  /** Run one drain of the full pipeline: whatever segments have landed
    * in `warcDir` and were not yet processed are parsed, deduped, and
    * tokenized under the saved `model`, appending
    * `(url, text, token_ids)` to `outDir` (`Trigger.AvailableNow` —
    * call again after more segments land; the checkpoint carries both
    * discovery and dedup state across calls and restarts).
    */
  def run(
      spark: SparkSession, warcDir: String, model: graft.operators.Bpe.Model,
      checkpointDir: String, outDir: String,
      glob: String = "*.warc*"): StreamingQuery =
    docStream(spark, warcDir, glob)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = batch.select("url", "text")
        // scope, not drain: the batch's own persists/cuts die with the
        // write, but the MODEL's materialized vocabulary must survive
        // into the next micro-batch (a global drain would truncate it)
        if (!docs.isEmpty) graft.operators.CacheRegistry.scope {
          docs.join(
              graft.operators.Bpe.applyModel(docs, "url", "text", model),
              Seq("url"), "left")
            .write.mode("append").parquet(outDir)
        }
      }
      .start()
}
