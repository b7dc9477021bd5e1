package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: documents concatenate (in id order)
  * into one token stream that is cut into fixed-size blocks, so each doc
  * needs its global TOKEN OFFSET — a running total over the whole
  * corpus. A single unpartitioned window would serialize that into one
  * task; this is the classic two-pass distributed prefix sum instead:
  *
  *  1. order-preserving range shards from one min/max aggregate (id
  *     arithmetic, not sampling, so shard assignment is deterministic),
  *  2. per-shard token totals — `shards` rows — prefix-summed on the
  *     driver and broadcast back,
  *  3. within-shard running totals via a window PARTITIONED by shard,
  *  4. offset = shard base + within-shard cumulative − own length.
  *
  * Every stage is bounded: the only global object is the `shards`-row
  * base table.
  */
object Packing {

  /** (input columns) + `offset` = tokens before this doc in id order. */
  def sequenceOffsets(
      df: DataFrame, idCol: String, lenCol: String, shards: Int = 64): DataFrame = {
    val stats = df.agg(
      min(col(idCol).cast("long")).as("lo"),
      max(col(idCol).cast("long")).as("hi")).collect()(0)
    if (stats.isNullAt(0))
      return df.withColumn("offset", lit(0L)).limit(0)
    val lo = stats.getLong(0)
    val hi = stats.getLong(1)
    val width = math.max(1L, (hi - lo) / shards + 1)
    val sharded = df.withColumn("__shard",
      ((col(idCol).cast("long") - lit(lo)) / lit(width)).cast("long"))
    val totals = sharded.groupBy("__shard")
      .agg(sum(col(lenCol).cast("long")).as("__tot"))
      .collect().sortBy(_.getLong(0))
    var acc = 0L
    val baseRows = totals.map { r =>
      val b = Row(r.getLong(0), acc); acc += r.getLong(1); b
    }
    val spark = df.sparkSession
    val bases = spark.createDataFrame(
      spark.sparkContext.parallelize(baseRows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__shard",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__base",
          org.apache.spark.sql.types.LongType))))
    val w = Window.partitionBy("__shard").orderBy(col(idCol))
    sharded
      .withColumn("__cum", sum(col(lenCol).cast("long")).over(w))
      .join(broadcast(bases), Seq("__shard"))
      .withColumn("offset",
        col("__base") + col("__cum") - col(lenCol).cast("long"))
      .drop("__shard", "__cum", "__base")
  }

  /** [[sequenceOffsets]] + block arithmetic: which fixed-size blocks of
    * the concatenated stream each doc spans (`first_block`, and
    * `n_blocks` — 0 for empty docs, which occupy no tokens).
    */
  def packedBlocks(
      df: DataFrame, idCol: String, lenCol: String, blockSize: Long,
      shards: Int = 64): DataFrame = {
    require(blockSize > 0, s"blockSize=$blockSize must be positive")
    sequenceOffsets(df, idCol, lenCol, shards)
      .withColumn("first_block", floor(col("offset") / blockSize).cast("long"))
      .withColumn("n_blocks",
        when(col(lenCol) > 0,
          floor((col("offset") + col(lenCol).cast("long") - 1) / blockSize)
            - floor(col("offset") / blockSize) + 1)
          .otherwise(lit(0L)).cast("long"))
  }

  /** RAG-style overlapping token-window chunking: each document splits
    * into windows of `chunkSize` tokens advancing by `chunkSize -
    * overlap`, final partial window kept (ceil division), empty docs
    * producing one empty chunk. Pure per-row generation (tokens →
    * sequence → explode → slice) — no shuffle at all; at 100 TB this is
    * scan-speed, and the output inherits the input's partitioning for
    * the downstream embed/index stages.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap=$overlap < chunkSize=$chunkSize")
    val step = chunkSize - overlap
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // integer ceil((n - overlap) / step), floored at one chunk; token
      // counts stay far below 2^52 so the double division is exact
      .withColumn("__n_chunks",
        greatest(lit(1),
          ceil((col("__n") - lit(overlap)).cast("double") / lit(step))
            .cast("int")))
      .select(col(idCol),
        explode(sequence(lit(0), col("__n_chunks") - 1)).as("chunk_id"),
        col("__toks"))
      .withColumn("__ck",
        slice(col("__toks"), col("chunk_id") * step + 1, lit(chunkSize)))
      .select(col(idCol), col("chunk_id"),
        size(col("__ck")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__ck")).as("chunk_text"))
  }
}
