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
        val docs = oneRowPerUrl(batch)
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

  /** One row per URL per drain: a drain whose segments carry the SAME
    * url with two different bodies (an in-flight re-crawl — different
    * fingerprints, so the exact-dedup state keeps both) must not reach
    * `applyModel`, whose per-url grouping would interleave both texts'
    * token ids into one garbled sequence duplicated onto both rows.
    * Deterministic winner: smallest content fingerprint (the fp column
    * [[docStream]] already carries).
    */
  private def oneRowPerUrl(batch: DataFrame): DataFrame =
    graft.operators.Browse.keepFirst(
      batch.select("url", "text", "fp"), Seq("url"),
      org.apache.spark.sql.functions.col("fp").asc)
      .select("url", "text")

  /** [[run]] with a NEAR-duplicate gate behind the exact one: after
    * the checkpointed exact-fingerprint dedup, each drain's documents
    * are filtered against a PERSISTED MinHash band-key index
    * ([[graft.operators.Dedup.incrementalLshDedup]]) — a re-crawled
    * page with a small edit (date stamp, hit counter) whose exact
    * fingerprint changed no longer re-enters the corpus. The index is
    * plain parquet in `bandIndexDir` (`bands` longs per admitted doc,
    * the state a 100 TB crawl can actually afford) and the drain
    * appends the survivors' keys before writing their tokenized rows;
    * a replayed drain re-admits identically because own-id keys never
    * suppress ([[graft.operators.Dedup.incrementalLshDedup]]'s
    * idempotence contract), so at-least-once `foreachBatch` semantics
    * keep the admitted SET exact.
    */
  def runFuzzy(
      spark: SparkSession, warcDir: String, model: graft.operators.Bpe.Model,
      checkpointDir: String, outDir: String, bandIndexDir: String,
      glob: String = "*.warc*",
      shingleN: Int = 3, k: Int = 64, bands: Int = 16): StreamingQuery =
    docStream(spark, warcDir, glob)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = oneRowPerUrl(batch)
        if (!docs.isEmpty) graft.operators.CacheRegistry.scope {
          val novel = graft.operators.CacheRegistry.track(
            graft.operators.Dedup.incrementalLshDedup(
              docs, bandIndex(spark, bandIndexDir), "url", "text",
              shingleN, k, bands).persist())
          // index append FIRST: a crash between the writes replays the
          // drain with these keys present, and own-id keys re-admit
          graft.operators.Dedup
            .lshBandKeys(novel, "url", "text", shingleN, k, bands)
            .write.mode("append").parquet(bandIndexDir)
          novel.join(
              graft.operators.Bpe.applyModel(novel, "url", "text", model),
              Seq("url"), "left")
            .write.mode("append").parquet(outDir)
        }
      }
      .start()

  /** The persisted band-key index relation — empty but correctly
    * typed before the first drain has appended anything.
    */
  private def bandIndex(spark: SparkSession, dir: String): DataFrame =
    try spark.read.parquet(dir)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("url",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("band_id",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("band_hash",
              org.apache.spark.sql.types.LongType))))
    }
}
