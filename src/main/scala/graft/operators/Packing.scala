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

  /** Boundary-respecting first-fit packing — the SFT complement of
    * [[packedBlocks]]: documents NEVER split across blocks, so each
    * block of `blockSize` tokens holds whole docs plus padding (the
    * stream packer has zero waste but cuts docs; this one wastes the
    * tail of every block but preserves doc boundaries — the
    * fragmentation trade a fine-tuning pipeline actually prices).
    * Docs pack in id order within deterministic id-range shards (the
    * [[sequenceOffsets]] shard rule), each shard's `block` ids local to
    * it: first-fit is inherently a sequential state machine, and the
    * shard rule makes the assignment a pure function of
    * (id, corpus min/max id) while shards pack in parallel — the same
    * per-shard layout a production packer writes per output file.
    * Oversized docs (len > blockSize) get a DEDICATED overfull block
    * (padding reads negative downstream) — surfaced, never silently
    * truncated. Like [[graft.operators.Sketch.mgCandidates]], the
    * per-shard fold is a genuine `mapPartitions` (imperative
    * data-dependent state no Catalyst expression expresses); rows
    * arrive sorted by (shard, id) via sortWithinPartitions, and state
    * resets on every shard change, so the output is deterministic no
    * matter how shards co-locate. Emits (idCol, lenCol, shard, block).
    *
    * `lengthDescending = true` packs each shard LARGEST-FIRST (ties by
    * id) instead of arrival order — the packing literature's
    * decreasing variant: long docs claim fresh blocks early and the
    * small-doc tail backfills, which cuts padding whenever lengths are
    * skewed. The state machine, shard rule, and overfull handling are
    * identical; ONLY the within-shard visit order changes (one
    * sortWithinPartitions key — same shuffle), so the two policies'
    * fragmentation is directly comparable (the q199 contrast). The
    * trade it prices: decreasing order improves utilization but loses
    * arrival locality (a block no longer holds consecutive ids).
    *
    * `extent` (inclusive (min, max) id) skips the driver-side stat
    * pass: at corpus scale that pass is a full scan, and a caller that
    * knows its id domain — or sweeps several configurations over one
    * cached relation (q202) — pays it once, or never. The extent must
    * COVER every id (the shard assignment is a pure function of
    * (id, lo, width)); a wider-than-actual extent only changes which
    * shards are empty, never correctness.
    */
  def firstFitBlocks(
      df: DataFrame, idCol: String, lenCol: String, blockSize: Long,
      shards: Int = 64, lengthDescending: Boolean = false,
      extent: Option[(Long, Long)] = None): DataFrame = {
    require(blockSize > 0, s"blockSize=$blockSize must be positive")
    require(shards > 0, s"shards=$shards must be positive")
    val session = df.sparkSession
    import session.implicits._
    val bounds = extent.orElse {
      val stats = df.agg(
        min(col(idCol).cast("long")).as("lo"),
        max(col(idCol).cast("long")).as("hi")).collect()(0)
      if (stats.isNullAt(0)) None
      else Some((stats.getLong(0), stats.getLong(1)))
    }
    // empty branch mirrors the non-empty output schema EXACTLY (both
    // id and len emerge long-cast from the typed fold below) — a
    // downstream union/writer that saw the empty branch first must not
    // bind a different schema
    if (bounds.isEmpty)
      return df.select(col(idCol).cast("long").as(idCol),
          col(lenCol).cast("long").as(lenCol))
        .withColumn("shard", lit(0L)).withColumn("block", lit(0L)).limit(0)
    val (lo, hi) = bounds.get
    require(lo <= hi, s"extent ($lo, $hi) must be ordered")
    // id-range sharding needs the span hi-lo as a long: full-range
    // keys (raw xxhash64 ids) would overflow BOTH this subtraction and
    // the ANSI-mode (_1 - lo) below — fail by name, and tell the
    // caller the one-shift fix, instead of surfacing a mid-job
    // ARITHMETIC_OVERFLOW
    require(BigInt(hi) - BigInt(lo) < BigInt(Long.MaxValue),
      s"id span [$lo, $hi] exceeds 2^63; shift hash " +
        "keys into [0, 2^63) first (e.g. shiftrightunsigned(xxhash64(k), 1))")
    val width = math.max(1L, (hi - lo) / shards + 1)
    df.select(col(idCol).cast("long").as("_1"),
        col(lenCol).cast("long").as("_2"))
      // integer DIV, not '/': long '/' promotes to double, whose rounded
      // quotient can land a 2^53+ id in the wrong shard vs the oracle's
      // exact floor division (and here the shard IS semantic — it decides
      // block boundaries, unlike sequenceOffsets' internal-only shards)
      .withColumn("_3", expr(s"(_1 - ${lo}L) DIV ${width}L"))
      .repartition(col("_3"))
      .sortWithinPartitions(
        (if (lengthDescending) Seq(col("_3"), col("_2").desc, col("_1"))
         else Seq(col("_3"), col("_1"))): _*)
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var fill = 0L
        var block = 0L
        it.map { case (id, len, shard) =>
          if (shard != curShard) { curShard = shard; block = 0L; fill = len }
          else if (fill + len <= blockSize) { fill += len }
          else { block += 1; fill = len }
          (id, len, shard, block)
        }
      }
      .toDF(idCol, lenCol, "shard", "block")
  }

  /** [[firstFitBlocks]] with an EXPLICIT packing domain instead of the
    * id-range shard rule: documents pack first-fit in id order WITHIN
    * each distinct `keyCol` value (per training source, per output
    * shard a plan names — the q208 plan→realize→pack chain), and a
    * block never spans two keys. Same sequential state machine, same
    * overfull contract; the state resets on every key change, so the
    * layout is a pure function of (key, id order) no matter how keys
    * co-locate. Emits (keyCol string-cast, idCol, lenCol, block).
    *
    * Scale shape: one shuffle on the key, shards pack in parallel —
    * one key = one task's sequential fold, the same bound as a
    * production per-source packer writing one file per source. A
    * single mega-key serializes into one task by construction (the
    * packing ORDER is the semantics); subdivide upstream by composing
    * the key with an id-range shard when a source outgrows a task.
    */
  def firstFitBlocksKeyed(
      df: DataFrame, idCol: String, lenCol: String, keyCol: String,
      blockSize: Long, lengthDescending: Boolean = false): DataFrame = {
    require(blockSize > 0, s"blockSize=$blockSize must be positive")
    val session = df.sparkSession
    import session.implicits._
    df.select(col(keyCol).cast("string").as("_1"),
        col(idCol).cast("long").as("_2"),
        col(lenCol).cast("long").as("_3"))
      .repartition(col("_1"))
      .sortWithinPartitions(
        (if (lengthDescending) Seq(col("_1"), col("_3").desc, col("_2"))
         else Seq(col("_1"), col("_2"))): _*)
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // explicit started flag, not a null sentinel: a NULL key on the
        // partition's first row must still take the reset branch
        // (null != null is false — an oversized first doc would
        // otherwise open at block 1)
        var started = false
        var curKey: String = null
        var fill = 0L
        var block = 0L
        it.map { case (key, id, len) =>
          if (!started || key != curKey) {
            started = true; curKey = key; block = 0L; fill = len
          }
          else if (fill + len <= blockSize) { fill += len }
          else { block += 1; fill = len }
          (key, id, len, block)
        }
      }
      .toDF(keyCol, idCol, lenCol, "block")
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

  /** FIM (fill-in-the-middle) transformation of token-id sequences —
    * the code-LLM data-prep verb (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): a
    * deterministic `fimRate` fraction of documents is rewritten in PSM
    * order, `[PRE] prefix [SUF] suffix [MID] middle`, so the model
    * learns infilling from the same corpus mass; the rest pass
    * through untouched. Document selection AND the two cut points are
    * pure functions of `md5(seed:id)` — hex slices of one hash,
    * mapped by modulo onto the selection bucket and the two ordered
    * cuts `0 ≤ i ≤ j ≤ n` — so the transform is reproducible across
    * runs, engines, and partitionings, and a DuckDB oracle replays
    * every rewritten sequence exactly (the [[Sampling.stableBucket]]
    * determinism convention; modulo bias over a 2⁴⁸ hex slice is
    * ≤ 2⁻⁴⁰ per document — negligible but DOCUMENTED, not hidden).
    * Sentinel ids are caller-chosen (use ids outside the model's
    * vocabulary and reserved page, e.g. negatives — they must never
    * collide with real tokens or [[graft.operators.Bpe.decodeIds]]
    * would mis-render).
    *
    * Scale shape: one codegen projection per row — an md5, two
    * modulos, three `slice`s and a `concat` — no shuffle, no UDF;
    * output length is input length + 3 sentinels for transformed
    * rows.
    */
  def fimTransform(
      df: DataFrame, idCol: String, idsCol: String,
      fimRate: Double, preId: Int, sufId: Int, midId: Int,
      seed: Long = 0L): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1,
      s"fimRate=$fimRate must be in [0, 1]")
    require(Set(preId, sufId, midId).size == 3,
      "sentinel ids must be distinct")
    val h = md5(concat(lit(seed.toString), lit(":"),
      col(idCol).cast("string")))
    // three independent hex slices of the one hash: selection bucket
    // (2 hex digits, the stableBucket256 rule) and two 12-digit cut
    // draws (48 bits each — conv() to BIGINT is exact at this width)
    val sel = conv(substring(h, 1, 2), 16, 10).cast("int")
    val n = size(col(idsCol))
    val d1 = conv(substring(h, 3, 12), 16, 10).cast("long")
    val d2 = conv(substring(h, 15, 12), 16, 10).cast("long")
    val i = (d1 % (n + 1)).cast("int")
    val j = (i + d2 % (n - i + 1)).cast("int")
    val rewritten = concat(
      array(lit(preId)), slice(col(idsCol), lit(1), i),
      array(lit(sufId)), slice(col(idsCol), j + lit(1), n - j),
      array(lit(midId)), slice(col(idsCol), i + lit(1), j - i))
    val threshold = math.floor(fimRate * 256).toInt
    df.withColumn("fim",
        (sel < threshold).as("fim"))
      .withColumn(idsCol,
        when(col("fim"), rewritten).otherwise(col(idsCol)))
  }
}
