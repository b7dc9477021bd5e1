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
  *     → parquet (batchId-keyed overwrite — exactly-once on replay)
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

  /** Decision-relation knob consumption — the PICK→EXECUTE wire at the
    * ingest boundary (r18 verdict order #3: the decision layer's sweep
    * queries pick `minNbScore` from the q188 PR curve, the LSH banding
    * from the q195 sweep, and the CDC divisor from the q193 sweep, yet
    * the drains ran at caller-supplied constants — the picks existed
    * but nothing streaming could consume them).
    *
    * `picksDir` points at a plain-parquet PICKS RELATION in the
    * q200/q206 output shape — at minimum the columns
    * `(knob: string, chosen: double)`; extra columns (rule,
    * quality_r6, cost) pass through untouched. Write it with
    * [[writePicks]] from the decision queries themselves (e.g.
    * `writePicks(q200Result.unionByName(q206Result, true), dir)`), or
    * from any relation carrying the two columns. Knobs the drains
    * read:
    *
    *   - `nb_threshold`  → `minNbScore` ([[runCurated]] /
    *     [[runCuratedFuzzy]] — the q188 PR-curve pick; overrides the
    *     numeric threshold only, the gate still arms via `nbRefDir`)
    *   - `lsh_bands`     → `bands` ([[runFuzzy]] / [[runCuratedFuzzy]]
    *     — the q195 banding pick; `k` stays caller-supplied and must
    *     stay divisible by the picked band count)
    *   - `cdc_divisor`   → `divisor` ([[runChunked]] — the q193 pick)
    *   - `neardup_jaccard` → `dupMassThreshold` (every drain that
    *     writes dup-mass telemetry — the q191 sweep's pick; the
    *     histogram then prices collapse at the threshold the decision
    *     layer actually chose, not a hard-coded 0.7)
    *
    * A knob MISSING from the relation falls back to the caller's
    * constant (the pre-r19 behavior, so a picks relation covering one
    * knob configures one knob). A `picksDir` that does not exist,
    * holds no parquet, holds an EMPTY relation (e.g. an over-eager
    * filter matched zero decision rows), carries a NULL knob/chosen,
    * or carries the same knob twice (two pick generations unioned —
    * collection order would resolve the ambiguity arbitrarily) FAILS
    * FAST — the caller asked for pick-driven configuration, and
    * silently running at fallback constants (or at an
    * arbitrarily-chosen generation) is the misconfiguration this wire
    * exists to remove.
    *
    * WHEN the picks are read: ONCE, at stream start (each `run*` call
    * resolves the knobs before `.start()`), never per micro-batch.
    * Two reasons, both load-bearing: (1) the fuzzy drains' persisted
    * band-key index stores `(band_id, band_hash)` rows whose layout is
    * a pure function of the banding — a mid-stream banding change
    * would silently desynchronize the suppression join against every
    * already-written key (re-banding requires rebuilding the index,
    * which is a restart-shaped operation anyway); (2) the
    * same-batchId crash-replay contract needs the replayed drain to
    * re-decide admission identically, so knob values must be stable
    * across a crash→replay window — the same rule the caller
    * constants they replace already lived under. A live pipeline
    * adopts refreshed picks by restarting the drain loop (the
    * `Trigger.AvailableNow` drains restart per call, so "re-read at
    * stream start" IS "re-read per drain" for them — each `run*` call
    * picks up the latest relation).
    */
  def readPicks(spark: SparkSession, dir: String): Map[String, Double] = {
    // casts, not raw getters: a picks relation written outside
    // writePicks may carry an INT/DECIMAL chosen column — the knob
    // VALUE is the contract, not the writer's physical type
    val rows =
      try {
        spark.read.parquet(dir)
          .select(col("knob").cast("string"), col("chosen").cast("double"))
          .collect()
      } catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"picksDir=$dir is not a readable picks relation (knob, " +
              s"chosen); write it with CorpusStream.writePicks — refusing " +
              s"to silently run at fallback constants", e)
      }
    require(rows.nonEmpty,
      s"picksDir=$dir holds an EMPTY picks relation — every knob would " +
        s"silently run at its fallback constant; write at least one " +
        s"(knob, chosen) row or drop the picksDir argument")
    val pairs = rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        s"picks relation at $dir carries a NULL knob/chosen row")
      r.getString(0) -> r.getDouble(1)
    }
    val dups = pairs.groupBy(_._1).collect {
      case (k, vs) if vs.length > 1 => k
    }
    require(dups.isEmpty,
      s"picks relation at $dir carries DUPLICATE rows for knob(s) " +
        s"${dups.mkString(", ")} — two pick generations in one " +
        s"directory; overwrite via writePicks so the drain's read is " +
        s"unambiguous")
    pairs.toMap
  }

  /** Persist a decision relation for the drains to consume: any
    * DataFrame carrying `(knob: string, chosen: double)` — the
    * q200/q206 output shape — overwritten as plain parquet. Overwrite,
    * not append: the relation is a SNAPSHOT of the current picks, and
    * two generations of the same knob in one directory would make the
    * drain's read ambiguous.
    */
  def writePicks(picks: DataFrame, dir: String): Unit =
    picks.write.mode("overwrite").parquet(dir)

  /** One knob's resolution: the picks value if present (cast through
    * the relation's double `chosen` column), else the caller constant.
    * Integer knobs validate that the picked double IS integral — a
    * fractional band count or divisor is a malformed relation, not a
    * roundable suggestion.
    */
  private def pickInt(picks: Map[String, Double], knob: String,
      fallback: Int): Int =
    picks.get(knob) match {
      case None => fallback
      case Some(v) =>
        require(v == math.rint(v) && v >= 1 && v <= Int.MaxValue,
          s"picked $knob=$v is not a positive integer")
        v.toInt
    }

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
    * tokenized under the saved `model`, writing
    * `(url, text, token_ids)` under `outDir` (`Trigger.AvailableNow` —
    * call again after more segments land; the checkpoint carries both
    * discovery and dedup state across calls and restarts).
    *
    * Output is EXACTLY-ONCE by construction: each micro-batch
    * OVERWRITES its own `batch_id=N` partition directory, so the
    * at-least-once `foreachBatch` replay after a crash between the
    * data write and the checkpoint commit rewrites the same rows into
    * the same directory instead of appending duplicates (the standard
    * batchId-keyed idempotent-sink recipe). Read the corpus with
    * `spark.read.parquet(outDir)` — `batch_id` surfaces as a partition
    * column.
    *
    * UPGRADE NOTE: releases before the batchId-keyed layout appended
    * flat parquet files directly under `outDir`. Resuming such a
    * checkpoint+outDir pair under this release would mix flat files
    * with `batch_id=N` partition directories and break partition
    * discovery on read — start a fresh `outDir` (or move the old flat
    * files into a synthetic `batch_id=-1` partition) before resuming.
    */
  def run(
      spark: SparkSession, warcDir: String, model: graft.operators.Bpe.Model,
      checkpointDir: String, outDir: String,
      glob: String = "*.warc*",
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      compactEvery: Int = 0,
      picksDir: String = null,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20): StreamingQuery = {
    // the q191 sweep's pick configures the dup-mass telemetry
    // threshold; resolved once at stream start ([[readPicks]])
    val eDupThr = resolvePicks(spark, picksDir)
      .getOrElse("neardup_jaccard", dupMassThreshold)
    docStream(spark, warcDir, glob)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val docs = oneRowPerUrl(batch)
        // scope, not drain: the batch's own persists/cuts die with the
        // write, but the MODEL's materialized vocabulary must survive
        // into the next micro-batch (a global drain would truncate it)
        if (!docs.isEmpty) graft.operators.CacheRegistry.scope {
          docs.select("url", "text").join(
              graft.operators.Bpe.applyModel(docs, "url", "text", model),
              Seq("url"), "left")
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
          // running corpus token telemetry (CMS frequency + KMV
          // distinct) over the docs this variant ADMITS — here
          // everything url-deduped ([[writeTokenSketches]]'s contract)
          writeTokenSketches(docs, sketchDir, sketchDepth, sketchWidth,
            kmvDir, kmvK, batchId)
          // per-source token stats — the epoch planner's live input
          // ([[writeTokenStats]]); this variant admits everything
          // url-deduped
          writeTokenStats(docs, tokenStatsDir, statsMinQualityTokens,
            batchId)
          // per-drain DEDUP DECISION telemetry — the collapse-or-not
          // decision surface for a live ingest (contract on
          // [[writeDupMass]]); this variant admits everything
          // url-deduped, so the histogram runs over `docs`
          if (dupMassDir != null)
            writeDupMass(docs, dupMassDir, dupMassShingleN,
              eDupThr, batchId)
          // the corpus and every telemetry layout are batchId-keyed
          // partition trees, so they all decay into small files; the
          // sketch dirs consolidate with a RE-AGGREGATING pass
          // ([[compactSketchDirs]]) so the consolidated partition
          // stays <= its fixed sketch size instead of accreting one
          // row-set per drain
          maybeCompact(spark, Seq(outDir) ++ Option(dupMassDir),
            compactEvery, batchId)
          compactSketchDirs(spark, sketchDir, kmvDir, kmvK,
            compactEvery, batchId, statsDir = tokenStatsDir)
          // (dup-mass rows rode the identity compaction above: each
          // row is already keyed by (drain_batch, size) — per-drain
          // histograms of different drains must never merge, so NO
          // re-aggregation, unlike the sketch dirs)
        }
      }
      .start()
  }

  /** The per-drain token-sketch telemetry writes every ingest variant
    * shares (r18 — the base drain had them since r14; the curated,
    * fuzzy, and chunked drains now take the same knobs): this drain's
    * token CMS (frequency) and KMV (distinct) sketches over the docs
    * the drain ADMITS, each under the same batchId-keyed overwrite
    * contract as the corpus itself — counters add and the KMV rows are
    * a pure function of the batch's token set, so a crash-replay
    * rewrites identical rows instead of double-counting.
    * [[readCmsSketch]] / [[readKmvSketch]] fold the partitions back
    * into ONE stream-lifetime sketch. Either dir null disables that
    * sketch; both null is a no-op (every existing drain unchanged).
    */
  private def writeTokenSketches(docs: DataFrame, sketchDir: String,
      sketchDepth: Int, sketchWidth: Int, kmvDir: String, kmvK: Int,
      batchId: Long): Unit = {
    if (sketchDir != null)
      graft.operators.Sketch.cmsSketch(
          docs.select(explode(graft.operators.TextAnalysis.tokens(
            col("text"))).as("tok")),
          "tok", sketchDepth, sketchWidth)
        .write.mode("overwrite")
        .parquet(s"$sketchDir/batch_id=$batchId")
    if (kmvDir != null)
      graft.operators.Sketch.kmvSketch(
          docs.select(lit("all").as("g"),
            explode(graft.operators.TextAnalysis.tokens(
              col("text"))).as("tok")),
          "g", "tok", kmvK)
        .write.mode("overwrite")
        .parquet(s"$kmvDir/batch_id=$batchId")
  }

  /** Per-source token STATS telemetry — the exact, additive numbers
    * the EPOCH PLANNER consumes, emitted by the drains themselves so
    * the planner never has to rescan the corpus (the ingest→planner
    * wire from the live side: [[planFromTokenStats]] runs the q197
    * waterfill over this directory alone — at 100 TB the plan input
    * is a bounded per-source relation, not data). One row per
    * registrable domain of the docs this drain ADMITS (the same
    * basis as the drain's other telemetry): doc count, token total,
    * and the count of docs clearing the epoch tier's quality floor
    * (`n_tokens >= minQualityTokens`, default 20 — the q197
    * weight_ppm convention). Exactly-once under the batchId-keyed
    * overwrite contract, and ADDITIVE — compaction re-aggregates by
    * summing the three counters, so the consolidated partition holds
    * ≤ |sources| rows no matter how many drains ran. Token totals
    * here are post-exact-dedup by construction (the drain admitted
    * only novel docs), which is exactly the "unique tokens" the
    * epoch planner budgets against.
    */
  private def writeTokenStats(docs: DataFrame, dir: String,
      minQualityTokens: Int, batchId: Long): Unit =
    if (dir != null)
      docs.select(
          graft.operators.TextAnalysis.registrableDomain(col("url"))
            .as("source"),
          size(graft.operators.TextAnalysis.tokens(col("text")))
            .cast("long").as("__nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("n_tokens"),
          sum(when(col("__nt") >= minQualityTokens, 1L).otherwise(0L))
            .as("n_quality"))
        .write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")

  /** The accumulated per-source stats folded into the epoch planner's
    * input shape: `(source, unique_tokens, weight_ppm)` — counters
    * sum across drains, then weight_ppm derives from the SUMS (ppm is
    * not additive; the parts are). Sources whose token total is 0
    * drop, the [[graft.operators.Sampling.epochPlan]] precondition.
    */
  def readTokenStats(spark: SparkSession, dir: String): DataFrame =
    foldStats(spark.read.parquet(dir))

  /** The one definition of the counter→planner-input fold (shared by
    * the whole-dir read, and [[commitFromTokenStats]]' per-landing
    * snapshots — the two must agree or the live commit decision
    * would gate a different plan than the one the planner runs).
    */
  private def foldStats(stats: DataFrame): DataFrame =
    stats.groupBy("source")
      .agg(sum(col("n_tokens")).as("unique_tokens"),
        expr("(1000000 * sum(n_quality)) DIV sum(n_docs)")
          .as("weight_ppm"))
      .filter(col("unique_tokens") > 0)

  /** The budget rule over a planner-input relation — `n20`/20ths of
    * the snapshot total (the default 47 is the 2.35× rule every batch
    * query uses); one bounded 1-row driver read (the epochBudget
    * pattern).
    */
  private def statsBudget(per: DataFrame, n20: Long): Long = {
    val r = per.agg(sum(col("unique_tokens"))).collect()(0)
    if (r.isNullAt(0)) 0L else n20 * r.getLong(0) / 20L
  }

  /** The live planner's knob resolution — the q206 decision relation
    * consumed at the PLANNER boundary the way [[readPicks]] already
    * configures the drain gates: `epoch_budget_20ths` (q206's budget
    * pick, default the 47/20ths rule) and `epoch_delta` (q206's
    * δ-sensitivity pick; [[graft.operators.Sampling
    * .epochPlanDiscounted]]'s exact-integer ladder needs a rational,
    * and the q207 sweep the pick comes from is the 1/denom family, so
    * any other double is a malformed relation, not a roundable
    * suggestion). Returns (budget-20ths, deltaNumer, deltaDenom).
    */
  private def plannerKnobs(spark: SparkSession,
      picksDir: String): (Long, Long, Long) = {
    val picks = resolvePicks(spark, picksDir)
    val b20 = pickInt(picks, "epoch_budget_20ths", 47).toLong
    val delta = picks.getOrElse("epoch_delta", 0.5)
    require(delta > 0.0 && delta <= 1.0,
      s"picked epoch_delta=$delta must be in (0, 1]")
    val denom = math.round(1.0 / delta)
    require(denom >= 1 && math.abs(1.0 / denom.toDouble - delta) < 1e-9,
      s"picked epoch_delta=$delta is not in the 1/denom family the " +
        "q207 sweep prices — refusing to run the planner at an " +
        "unswept discount")
    (b20, 1L, denom)
  }

  /** The epoch plan derived from the drains' OWN telemetry — the live
    * half of the q197/q212/q213 tier: the same waterfill (δ = 1/2,
    * 4-epoch cap by default) under the same 2.35× (47/20ths) budget
    * rule, computed over [[readTokenStats]]' bounded relation instead
    * of a corpus scan. `picksDir` lets the q206 decision relation set
    * the budget and δ ([[plannerKnobs]]) — the planner analog of the
    * drains' picks wire; absent picks, the constants stand. For the
    * plan-as-of-each-landing ladder and the commit decision over it,
    * see [[commitFromTokenStats]].
    */
  def planFromTokenStats(spark: SparkSession, dir: String,
      maxEpochs: Int = 4, picksDir: String = null): DataFrame = {
    val (b20, dn, dd) = plannerKnobs(spark, picksDir)
    val per = readTokenStats(spark, dir)
    graft.operators.Sampling.epochPlanDiscounted(per,
      statsBudget(per, b20), maxEpochs, dn, dd)
  }

  /** The LIVE plan-commit decision — q213's suffix-settling rule run
    * entirely off the drains' token-stats telemetry, closing the loop
    * [[planFromTokenStats]]' r19 docstring only described: the
    * batchId-keyed stats layout retains the per-landing granularity,
    * so the plan AS OF each landing is re-derivable after the fact
    * (cumulate partitions ≤ the landing, fold, plan under THAT
    * snapshot's 47/20ths budget — the q212/q213 batch-side semantics
    * exactly), and [[graft.operators.Sampling.planCommitRule]] over
    * the ladder yields per-source `settled_at_batches` / `flapped`
    * and the whole-mixture `commit_batches` row.
    *
    * Compaction coarsens the ladder honestly: a coverage partition
    * `batch_id=-c` (batches 0..c-2 consolidated — [[compactBatches]]'
    * convention) is one landing at id `c-2`; "plan after batch 0"
    * stops being a distinct question once batches 0–1 have merged,
    * and the rule runs over the landings the telemetry still
    * distinguishes rather than inventing snapshots the layout no
    * longer carries. A fully-compacted dir degenerates to the 1-plan
    * ladder (everything settles at the final landing, nothing can
    * flap) — the caller who wants a finer decision keeps
    * `compactEvery` above the decision horizon.
    *
    * Scale shape: the stats relation is ≤ |landings|·|sources| rows
    * (never the corpus); driver traffic is |landings| + one 1-row
    * budget read per landing; each snapshot plan is |sources|·4
    * window rows; the rule's grid is |ladder|·|sources|. `picksDir`
    * configures the per-landing planner exactly as on
    * [[planFromTokenStats]] — every snapshot in the ladder runs at
    * the SAME picked knobs (a ladder mixing knob settings would gate
    * plan drift against knob drift and decide nothing). `gateCol`
    * passes through to the rule: `full_epochs` (default — plan
    * identity, q213) or `tokens_alloc` (allocation identity, the
    * token-denominated gate the telemetry can answer without the
    * corpus; q217's realized-token gate needs the docs themselves
    * and stays batch-side).
    */
  def commitFromTokenStats(spark: SparkSession, dir: String,
      maxEpochs: Int = 4, picksDir: String = null,
      gateCol: String = "full_epochs"): DataFrame = {
    val (b20, dn, dd) = plannerKnobs(spark, picksDir)
    val landing = when(col("batch_id") < 0, -col("batch_id") - 2)
      .otherwise(col("batch_id")).cast("long")
    // deliberately NOT persisted: the stats dir MUTATES under
    // [[compactBatches]], and a cached plan keyed on the path would
    // substitute its stale rows into the NEXT read of the same dir
    // (CacheManager matches canonicalized file-source subtrees) —
    // re-asking after a compaction would silently answer from the
    // pre-compaction layout. The relation is bounded telemetry
    // (≤ |landings|·|sources| rows), so the |landings| re-scans the
    // snapshot filters pay are noise; the spec's compaction arm pins
    // this.
    val stats = spark.read.parquet(dir).withColumn("__landing", landing)
    val landings = stats.select(col("__landing")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    require(landings.nonEmpty,
      s"tokenStatsDir=$dir holds no batch partitions — run a drain " +
        "with tokenStatsDir set before asking for a commit decision")
    val plans = landings.map { wm =>
      val per = foldStats(stats.filter(col("__landing") <= wm))
      wm -> graft.operators.Sampling.epochPlanDiscounted(per,
        statsBudget(per, b20), maxEpochs, dn, dd)
    }
    graft.operators.Sampling.planCommitRule(plans, gateCol)
  }

  /** The sketch layouts' RE-AGGREGATING compaction (CMS counters
    * re-sum, KMV buffers re-merge — never the identity pass, which
    * would accrete one row set per drain instead of holding the
    * sketch's fixed size). Shared by every drain that takes the
    * sketch-telemetry knobs.
    */
  private def compactSketchDirs(spark: SparkSession, sketchDir: String,
      kmvDir: String, kmvK: Int, compactEvery: Int, batchId: Long,
      statsDir: String = null): Unit = {
    if (sketchDir != null)
      maybeCompact(spark, Seq(sketchDir), compactEvery, batchId,
        _.groupBy(col("row"), col("bucket"))
          .agg(sum(col("c")).as("c")))
    if (kmvDir != null)
      maybeCompact(spark, Seq(kmvDir), compactEvery, batchId,
        mergeKmvRows(_, kmvK))
    // token stats are additive — the consolidated partition re-sums
    // to <= |sources| rows instead of accreting one row set per drain
    if (statsDir != null)
      maybeCompact(spark, Seq(statsDir), compactEvery, batchId,
        _.groupBy(col("source"))
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(col("n_quality")).as("n_quality")))
  }

  /** The merged Count-Min sketch of every drain so far: the
    * batchId-keyed per-drain sketches under `dir` re-summed —
    * [[graft.operators.Sketch.cmsMerge]] over the partition layout.
    * ≤ depth·width rows out regardless of how many drains ran.
    */
  def readCmsSketch(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  /** KMV merge over a relation of per-drain (g, kmv) rows: explode,
    * and re-run the [[graft.operators.Sketch.KmvAgg]] aggregator over
    * the hashes — its `merge` IS union-keep-k-smallest, so this equals
    * the sketch of the union stream by construction. Shared by
    * [[readKmvSketch]] and the telemetry compaction pass.
    */
  private def mergeKmvRows(rows: DataFrame, k: Int): DataFrame =
    rows.select(col("g"), explode(col("kmv")).as("h"))
      .groupBy(col("g"))
      .agg(udaf(new graft.operators.Sketch.KmvAgg(k),
        org.apache.spark.sql.Encoders.scalaLong)(col("h")).as("kmv"))

  /** The merged KMV distinct sketch of every drain so far (one row per
    * group): union the per-drain buffers, keep the k smallest distinct
    * hashes — [[graft.operators.Sketch.kmvEstimate]] turns it into the
    * stream-lifetime distinct-count estimate. ≤ k longs out regardless
    * of how many drains ran.
    */
  def readKmvSketch(spark: SparkSession, dir: String, k: Int): DataFrame =
    mergeKmvRows(spark.read.parquet(dir).select("g", "kmv"), k)

  /** The per-drain dedup-decision telemetry: one q185-shaped histogram
    * row set per drain, keyed by the compaction-stable `drain_batch`
    * DATA column (never the partition id). Deliberately NOT merged
    * across drains — a dup-mass histogram is a within-closure read,
    * and summing two drains' histograms would describe a corpus no
    * closure ever ran on. Every ingest variant histograms the docs it
    * ADMITS — its actual corpus contribution: [[run]] and
    * [[runChunked]] the drain's url-deduped docs, [[runCurated]] and
    * [[runCuratedFuzzy]] the post-quality-gate survivors, [[runFuzzy]]
    * the post-near-dup-gate novel docs (a gate-killed near-dup never
    * reaches the telemetry; what the histogram reads there is the
    * gate's residual — exact-Jaccard pairs whose bands missed).
    */
  def readDupMassTelemetry(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .select("drain_batch", "size", "n_clusters", "doc_mass", "removable")

  /** The one dup-mass telemetry write every ingest variant shares:
    * this drain's within-batch near-dup duplication-mass histogram
    * (the q185 read, live) over the docs the drain ADMITS, under the
    * same batchId-keyed overwrite contract as the corpus itself (the
    * histogram is a pure function of the drain's docs, so a
    * crash-replay rewrites identical rows). The drain id ALSO rides as
    * the compaction-stable `drain_batch` DATA column. Doc key: NUMERIC
    * per the cluster tier's contract (connected components casts node
    * ids to long — a url string throws); xxhash64 shifted into
    * [0, 2^63) so any downstream id-range consumer is safe from
    * full-range spans.
    */
  private def writeDupMass(docs: DataFrame, dupMassDir: String,
      shingleN: Int, threshold: Double, batchId: Long): Unit =
    graft.operators.Dedup.dupMassHistogram(
        docs.select(shiftrightunsigned(xxhash64(col("url")), 1)
          .as("doc_key"), col("text")), "doc_key", "text",
        shingleN, threshold)
      .withColumn("drain_batch", lit(batchId))
      .write.mode("overwrite")
      .parquet(s"$dupMassDir/batch_id=$batchId")

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
      .select("url", "text", "fp")

  /** [[run]] with a NEAR-duplicate gate behind the exact one: after
    * the checkpointed exact-fingerprint dedup, each drain's documents
    * are filtered against a PERSISTED MinHash band-key index
    * ([[graft.operators.Dedup.incrementalLshDedup]]) — a re-crawled
    * page with a small edit (date stamp, hit counter) whose exact
    * fingerprint changed no longer re-enters the corpus. The index is
    * plain parquet in `bandIndexDir` (`bands` longs per admitted doc,
    * the state a 100 TB crawl can actually afford).
    *
    * The gate is keyed by the CONTENT fingerprint (`fp`), not the url:
    * a same-url edited re-crawl gets a NEW fp, so the old fp's index
    * keys suppress it like any other near-dup (url-keyed, its own
    * url's keys would exempt it and the gate's motivating case would
    * never fire — only url-varying mirrors would be caught). Replay
    * idempotence still holds: same content ⇒ same fp ⇒ own-id
    * exemption re-admits identically
    * ([[graft.operators.Dedup.incrementalLshDedup]]'s contract).
    *
    * Both writes are batchId-keyed OVERWRITES of their own
    * `batch_id=N` partition directory, so a crash-replay rewrites the
    * same rows instead of appending duplicates — the admitted set AND
    * the stored rows (index and output) are exactly-once.
    */
  def runFuzzy(
      spark: SparkSession, warcDir: String, model: graft.operators.Bpe.Model,
      checkpointDir: String, outDir: String, bandIndexDir: String,
      glob: String = "*.warc*",
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      compactEvery: Int = 0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      picksDir: String = null,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20): StreamingQuery = {
    // resolved ONCE at stream start ([[readPicks]]' contract — the
    // band-index key layout is a function of the banding)
    val picks = resolvePicks(spark, picksDir)
    val eBands = pickInt(picks, "lsh_bands", bands)
    require(k % eBands == 0,
      s"numHashes k=$k must be divisible by the banding bands=$eBands")
    val eDupThr = picks.getOrElse("neardup_jaccard", dupMassThreshold)
    pinLayout(spark, bandIndexDir,
      "shingleN" -> shingleN, "k" -> k, "bands" -> eBands)
    docStream(spark, warcDir, glob)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fuzzyBatch(spark, model, outDir, bandIndexDir, shingleN, k,
          eBands, compactEvery, dupMassDir = dupMassDir,
          dupMassShingleN = dupMassShingleN,
          dupMassThreshold = eDupThr,
          sketchDir = sketchDir, sketchDepth = sketchDepth,
          sketchWidth = sketchWidth, kmvDir = kmvDir, kmvK = kmvK,
          tokenStatsDir = tokenStatsDir,
          statsMinQualityTokens = statsMinQualityTokens)(
          batch, batchId)
      }
      .start()
  }

  /** `Map.empty` when no picks dir was supplied; [[readPicks]]'
    * fail-fast read otherwise. */
  private def resolvePicks(spark: SparkSession,
      picksDir: String): Map[String, Double] =
    if (picksDir == null) Map.empty else readPicks(spark, picksDir)

  /** Pin the LAYOUT-DEFINING knobs of a persisted directory — the
    * band-key index's rows are a pure function of (shingleN, k,
    * bands) and the chunk store's fingerprints of the CDC divisor, so
    * a later drain running different values would silently
    * desynchronize against every already-written row (near-dups
    * re-entering the corpus, or stored chunks never deduplicating
    * again). The guard the resolve-once-at-stream-start doc promised
    * but nothing enforced ACROSS stream restarts (a refreshed picks
    * relation, or simply a caller editing constants): the first
    * stream start writes a `_graft_layout` marker (underscore prefix
    * — Spark's file listing ignores it, and [[compactBatches]] only
    * touches `batch_id=` directories); every later start REQUIRES
    * equality and names both layouts in the error. Adopting a new
    * banding/divisor is a rebuild-shaped operation: point the drain
    * at a fresh directory (re-keying the old rows is corpus-sized
    * work no drain should do implicitly).
    */
  private def pinLayout(spark: SparkSession, dir: String,
      props: (String, Any)*): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir, "_graft_layout")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = props.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(" ")
    if (fs.exists(path)) {
      val in = fs.open(path)
      val got =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      require(got == want,
        s"$dir was written under layout {$got} but this drain is " +
          s"configured for {$want} — the persisted rows would silently " +
          s"stop matching; point the drain at a fresh directory (or " +
          s"restore the original knobs) instead")
    } else {
      val out = fs.create(path, false)
      try out.write(want.getBytes("UTF-8")) finally out.close()
    }
  }

  /** One [[runFuzzy]] micro-batch, factored out so the at-least-once
    * replay contract is directly testable: executing this twice with
    * the SAME batchId and data must leave index and output byte-wise
    * identical (CorpusStreamSpec's crash-replay test does exactly
    * that).
    */
  private[streaming] def fuzzyBatch(
      spark: SparkSession, model: graft.operators.Bpe.Model,
      outDir: String, bandIndexDir: String,
      shingleN: Int, k: Int, bands: Int,
      compactEvery: Int = 0,
      bigramRefDir: String = null, minAvgLogprob: Double = 0.0,
      blockTerms: Seq[String] = Nil, blockPhrases: Seq[String] = Nil,
      nbRefDir: String = null, minNbScore: Double = 0.0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20)(
      batch: DataFrame, batchId: Long): Unit = {
    val docs = oneRowPerUrl(batch)
    if (!docs.isEmpty) graft.operators.CacheRegistry.scope {
      val novel = graft.operators.CacheRegistry.track(
        graft.operators.Dedup.incrementalLshDedup(
          docs, bandIndex(spark, bandIndexDir, batchId), "fp", "text",
          shingleN, k, bands).persist())
      // index write FIRST: a crash between the writes replays the
      // drain against the same earlier-batch keys (the current
      // batch's partition is excluded from the gate's read), and the
      // overwrite makes the replayed write a rewrite, not an append
      graft.operators.Dedup
        .lshBandKeys(novel, "fp", "text", shingleN, k, bands)
        .write.mode("overwrite")
        .parquet(s"$bandIndexDir/batch_id=$batchId")
      novel.select("url", "text").join(
          graft.operators.Bpe.applyModel(novel, "url", "text", model),
          Seq("url"), "left")
        .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      // token-sketch telemetry over the ADMITTED (post-near-dup-gate)
      // docs — this drain's actual corpus contribution, the same
      // basis as its dup-mass histogram below
      writeTokenSketches(novel, sketchDir, sketchDepth, sketchWidth,
        kmvDir, kmvK, batchId)
      writeTokenStats(novel, tokenStatsDir, statsMinQualityTokens,
        batchId)
      // per-drain dup-mass telemetry over the ADMITTED docs — the
      // near-dup gate runs FIRST (cross-drain index AND within-batch
      // band collisions), so a gate-killed near-dup never reaches the
      // histogram: what the telemetry reads is the gate's RESIDUAL —
      // exact-Jaccard mass whose MinHash bands happened not to
      // collide, the false-negative rate a banding audit (q195)
      // prices — normally all-singleton rows
      if (dupMassDir != null)
        writeDupMass(novel, dupMassDir, dupMassShingleN,
          dupMassThreshold, batchId)
      maybeCompact(spark, Seq(bandIndexDir, outDir) ++ Option(dupMassDir),
        compactEvery, batchId)
      compactSketchDirs(spark, sketchDir, kmvDir, kmvK, compactEvery,
        batchId, statsDir = tokenStatsDir)
    }
  }

  /** Auto-compaction trigger for the streaming drains: after every
    * `compactEvery`-th drain (opt-in, 0 = off), consolidate each
    * layout's sub-`batchId` partitions. Runs AFTER the drain's own
    * writes, with `beforeBatch` derived from the LIVE `batchId` the
    * sink handed `foreachBatch` — the one authoritative safe bound
    * (the still-replayable current partition is never touched), so
    * callers of the `run*` knob cannot reproduce the manual-call
    * misuse [[compactBatches]]' scaladoc warns about. A replay of the
    * same drain re-triggers harmlessly: gate decisions were already
    * made against the (row-identical) consolidated index, and the
    * pass no-ops below 2 consolidatable partitions.
    */
  private def maybeCompact(spark: SparkSession, dirs: Seq[String],
      compactEvery: Int, batchId: Long,
      aggregate: DataFrame => DataFrame = identity): Unit =
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      dirs.foreach(d =>
        compactBatches(spark, d, beforeBatch = batchId,
          aggregate = aggregate))

  /** The CURATED ingest — q134's composed quality chain running in the
    * stream: the doc stream is extracted with
    * [[graft.operators.TextAnalysis.htmlToTextLines]] (block tags
    * become lines — the LINE-level rules are dead on flattened text),
    * each drain's novel documents pass
    * [[graft.operators.TextAnalysis.c4LineFilters]]' page gate and
    * [[graft.operators.TextAnalysis.gopherQualityRules]] over the
    * CLEANED text, and the survivors tokenize under the saved model
    * into the same batchId-keyed exactly-once layout as [[run]].
    * Cross-batch exact dedup stays on the RAW extracted text
    * (the checkpointed `dropDuplicates` state) — the gate is
    * content-identity BEFORE cleaning, the documented choice: two
    * raw-distinct pages whose cleaned text coincides both land.
    */
  def runCurated(
      spark: SparkSession, warcDir: String, model: graft.operators.Bpe.Model,
      checkpointDir: String, outDir: String,
      glob: String = "*.warc*",
      minWords: Int = 30, minStopKinds: Int = 1,
      compactEvery: Int = 0,
      bigramRefDir: String = null,
      minAvgLogprob: Double = 0.0,
      blockTerms: Seq[String] = Nil,
      blockPhrases: Seq[String] = Nil,
      nbRefDir: String = null,
      minNbScore: Double = 0.0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      picksDir: String = null,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20): StreamingQuery = {
    // the q188 PR-curve pick configures the NB gate's threshold, the
    // q191 pick the dup-mass telemetry threshold; resolved once at
    // stream start ([[readPicks]]' contract)
    val cPicks = resolvePicks(spark, picksDir)
    val eMinNb = cPicks.getOrElse("nb_threshold", minNbScore)
    val eDupThr = cPicks.getOrElse("neardup_jaccard", dupMassThreshold)
    graft.sources.WarcReader.readStream(spark, warcDir, glob)
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri").as("url"),
        graft.operators.TextAnalysis.htmlToTextLines(
          decode(col("body"), "UTF-8")).as("text"))
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fp")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curatedBatch(spark, model, outDir, minWords, minStopKinds,
          compactEvery, bigramRefDir, minAvgLogprob,
          blockTerms, blockPhrases, nbRefDir, eMinNb,
          dupMassDir, dupMassShingleN, eDupThr,
          sketchDir, sketchDepth, sketchWidth, kmvDir, kmvK,
          tokenStatsDir, statsMinQualityTokens)(
          batch, batchId)
      }
      .start()
  }

  /** One [[runCurated]] micro-batch (factored out like [[fuzzyBatch]]
    * so the at-least-once replay contract is directly testable).
    */
  private[streaming] def curatedBatch(
      spark: SparkSession, model: graft.operators.Bpe.Model,
      outDir: String, minWords: Int, minStopKinds: Int,
      compactEvery: Int = 0,
      bigramRefDir: String = null, minAvgLogprob: Double = 0.0,
      blockTerms: Seq[String] = Nil, blockPhrases: Seq[String] = Nil,
      nbRefDir: String = null, minNbScore: Double = 0.0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20)(
      batch: DataFrame, batchId: Long): Unit = {
    val docs = oneRowPerUrl(batch)
    if (!docs.isEmpty) graft.operators.CacheRegistry.scope {
      curateAndWrite(model, outDir, minWords, minStopKinds,
        bigramRefDir, minAvgLogprob, blockTerms, blockPhrases,
        nbRefDir, minNbScore, dupMassDir, dupMassShingleN,
        dupMassThreshold, sketchDir, sketchDepth, sketchWidth,
        kmvDir, kmvK, tokenStatsDir, statsMinQualityTokens)(
        docs, batchId)
      maybeCompact(spark, Seq(outDir) ++ Option(dupMassDir),
        compactEvery, batchId)
      compactSketchDirs(spark, sketchDir, kmvDir, kmvK, compactEvery,
        batchId, statsDir = tokenStatsDir)
    }
  }

  /** The curated quality chain of one drain's NOVEL documents —
    * C4 page gate → (optional) word-boundary blocklist gate
    * ([[graft.operators.TextAnalysis.blocklistFilter]], C4's badwords
    * rule) → Gopher battery → (optional) perplexity gate over the
    * CLEANED text → (optional) NB classifier gate
    * ([[graft.operators.TextAnalysis.scoreUnderNbRef]], the
    * fastText-seed-gate analog) → tokenize — writing the survivors
    * into the batchId-keyed exactly-once layout. Shared tail of
    * [[curatedBatch]] and [[curatedFuzzyBatch]].
    *
    * The perplexity gate is the STREAMING half of the CCNet lifecycle
    * ([[graft.operators.TextAnalysis.saveBigramRef]] trains the
    * reference ONCE offline; the threshold comes from an offline
    * [[graft.operators.TextAnalysis.perplexityFilter]] pass over a
    * sample — a per-drain quantile would make admission depend on
    * batch composition and break replay determinism, so the drain
    * takes the PRECOMPUTED scalar): a doc lands only if its mean
    * bigram log-prob under the saved statistics reaches
    * `minAvgLogprob`. Unscorable docs (< 2 tokens after cleaning)
    * have no defined perplexity and are REJECTED while the gate is
    * on — the CCNet convention. Per-drain cost follows batch size
    * (the reference is read, never recomputed). `bigramRefDir = null`
    * (default) disables the gate; every existing drain is unchanged.
    */
  private def curateAndWrite(
      model: graft.operators.Bpe.Model, outDir: String,
      minWords: Int, minStopKinds: Int,
      bigramRefDir: String = null, minAvgLogprob: Double = 0.0,
      blockTerms: Seq[String] = Nil, blockPhrases: Seq[String] = Nil,
      nbRefDir: String = null, minNbScore: Double = 0.0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20)(
      docs: DataFrame, batchId: Long): Unit = {
    val cleaned = graft.operators.TextAnalysis
      .c4LineFilters(docs.select("url", "text"), "text")
      .filter(col("page_keep"))
      .select(col("url"), col("clean_text").as("text"))
    // C4's badwords rule, word-boundary exact, applied to the CLEANED
    // text (the lines the page actually keeps — boilerplate that the
    // line filter already discarded cannot block a page). Off when
    // both lists are empty; every existing drain is unchanged.
    val unblocked =
      if (blockTerms.isEmpty && blockPhrases.isEmpty) cleaned
      else graft.operators.TextAnalysis
        .blocklistFilter(cleaned, "text", blockTerms, blockPhrases)
        .filter(col("keep"))
        .select("url", "text")
    val quality = graft.operators.TextAnalysis
      .gopherQualityRules(unblocked, "text",
        minWords = minWords, minStopKinds = minStopKinds)
      .filter(col("keep"))
      .select("url", "text")
    val kept =
      if (bigramRefDir == null) quality
      else quality.join(
        graft.operators.TextAnalysis.scoreUnderBigramRef(
            quality.sparkSession, bigramRefDir, quality, "url", "text")
          .filter(col("avg_logprob") >= minAvgLogprob)
          .select("url"),
        Seq("url"), "left_semi")
    // classifier gate (the fastText-style seed gate, NB form): the
    // STREAMING half of the saveNbRef lifecycle — the labeled seed
    // trains ONCE offline, the drain reads counts and admits only
    // docs whose log-likelihood-ratio score reaches the PRECOMPUTED
    // threshold (a per-drain threshold would break replay
    // determinism, the perplexity-gate rule). nbRefDir = null
    // (default) disables the gate; every existing drain is unchanged.
    val admitted =
      if (nbRefDir == null) kept
      else kept.join(
        graft.operators.TextAnalysis.scoreUnderNbRef(
            kept.sparkSession, nbRefDir, kept, "url", "text")
          .filter(col("score") >= minNbScore)
          .select("url"),
        Seq("url"), "left_semi")
    if (!admitted.isEmpty) {
      // the gates consume `admitted` once; the corpus write (and the
      // optional telemetry) read it again — persist within the drain's
      // CacheRegistry scope so the quality chain runs once per drain
      val adm = graft.operators.CacheRegistry.track(admitted.persist())
      adm.join(
          graft.operators.Bpe.applyModel(adm, "url", "text", model),
          Seq("url"), "left")
        .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      // token-sketch telemetry over the ADMITTED (post-quality-gate)
      // docs — the curated chain's gates define the contribution, the
      // same basis as the dup-mass histogram below
      writeTokenSketches(adm, sketchDir, sketchDepth, sketchWidth,
        kmvDir, kmvK, batchId)
      writeTokenStats(adm, tokenStatsDir, statsMinQualityTokens,
        batchId)
      // per-drain dedup-decision telemetry over the ADMITTED docs —
      // what this drain actually contributed to the corpus
      // ([[writeDupMass]]'s contract, post-gate here because the
      // curated chain's gates define the contribution)
      if (dupMassDir != null)
        writeDupMass(adm, dupMassDir, dupMassShingleN, dupMassThreshold,
          batchId)
    }
  }

  /** [[runCurated]] with [[runFuzzy]]'s NEAR-duplicate gate composed
    * BEHIND the exact dedup and BEFORE the quality gates — the full
    * curated build a production crawl runs: an edited re-crawl (date
    * stamp, hit counter — new exact fingerprint, near-identical
    * shingles) is suppressed by the persisted MinHash band index and
    * never reaches the C4/Gopher batteries at all, so per-drain
    * quality compute follows NOVEL content, not re-crawl volume. The
    * index is keyed by content fingerprint and carries keys for EVERY
    * gate-passing document — including ones the quality gates then
    * reject — so a near-dup of a quality-reject is suppressed from
    * re-running the batteries every drain. Index write first, both
    * writes batchId-keyed overwrites: the same-batchId replay contract
    * of [[fuzzyBatch]] carries over unchanged.
    */
  def runCuratedFuzzy(
      spark: SparkSession, warcDir: String, model: graft.operators.Bpe.Model,
      checkpointDir: String, outDir: String, bandIndexDir: String,
      glob: String = "*.warc*",
      minWords: Int = 30, minStopKinds: Int = 1,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      compactEvery: Int = 0,
      bigramRefDir: String = null,
      minAvgLogprob: Double = 0.0,
      blockTerms: Seq[String] = Nil,
      blockPhrases: Seq[String] = Nil,
      nbRefDir: String = null,
      minNbScore: Double = 0.0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3,
      dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      picksDir: String = null,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20): StreamingQuery = {
    // the gated knobs resolve once at stream start ([[readPicks]]'
    // contract): the q195 banding pick configures the near-dup gate,
    // the q188 PR-curve pick the NB gate's threshold, the q191 pick
    // the dup-mass telemetry threshold
    val picks = resolvePicks(spark, picksDir)
    val eBands = pickInt(picks, "lsh_bands", bands)
    require(k % eBands == 0,
      s"numHashes k=$k must be divisible by the banding bands=$eBands")
    val eMinNb = picks.getOrElse("nb_threshold", minNbScore)
    val eDupThr = picks.getOrElse("neardup_jaccard", dupMassThreshold)
    pinLayout(spark, bandIndexDir,
      "shingleN" -> shingleN, "k" -> k, "bands" -> eBands)
    graft.sources.WarcReader.readStream(spark, warcDir, glob)
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri").as("url"),
        graft.operators.TextAnalysis.htmlToTextLines(
          decode(col("body"), "UTF-8")).as("text"))
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fp")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curatedFuzzyBatch(spark, model, outDir, bandIndexDir,
          minWords, minStopKinds, shingleN, k, eBands, compactEvery,
          bigramRefDir, minAvgLogprob, blockTerms, blockPhrases,
          nbRefDir, eMinNb, dupMassDir, dupMassShingleN,
          eDupThr, sketchDir, sketchDepth, sketchWidth,
          kmvDir, kmvK, tokenStatsDir, statsMinQualityTokens)(
          batch, batchId)
      }
      .start()
  }

  /** One [[runCuratedFuzzy]] micro-batch (factored out like
    * [[fuzzyBatch]] so the replay contract is directly testable).
    */
  private[streaming] def curatedFuzzyBatch(
      spark: SparkSession, model: graft.operators.Bpe.Model,
      outDir: String, bandIndexDir: String,
      minWords: Int, minStopKinds: Int,
      shingleN: Int, k: Int, bands: Int,
      compactEvery: Int = 0,
      bigramRefDir: String = null, minAvgLogprob: Double = 0.0,
      blockTerms: Seq[String] = Nil, blockPhrases: Seq[String] = Nil,
      nbRefDir: String = null, minNbScore: Double = 0.0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20)(
      batch: DataFrame, batchId: Long): Unit = {
    val docs = oneRowPerUrl(batch)
    if (!docs.isEmpty) graft.operators.CacheRegistry.scope {
      val novel = graft.operators.CacheRegistry.track(
        graft.operators.Dedup.incrementalLshDedup(
          docs, bandIndex(spark, bandIndexDir, batchId), "fp", "text",
          shingleN, k, bands).persist())
      graft.operators.Dedup
        .lshBandKeys(novel, "fp", "text", shingleN, k, bands)
        .write.mode("overwrite")
        .parquet(s"$bandIndexDir/batch_id=$batchId")
      curateAndWrite(model, outDir, minWords, minStopKinds,
        bigramRefDir, minAvgLogprob, blockTerms, blockPhrases,
        nbRefDir, minNbScore, dupMassDir, dupMassShingleN,
        dupMassThreshold, sketchDir, sketchDepth, sketchWidth,
        kmvDir, kmvK, tokenStatsDir, statsMinQualityTokens)(
        novel, batchId)
      maybeCompact(spark,
        Seq(bandIndexDir, outDir) ++ Option(dupMassDir),
        compactEvery, batchId)
      compactSketchDirs(spark, sketchDir, kmvDir, kmvK, compactEvery,
        batchId, statsDir = tokenStatsDir)
    }
  }

  /** Small-files maintenance for the batchId-keyed layouts ([[run]] /
    * [[runFuzzy]] / [[runCurated]] outputs and the band index): after
    * thousands of drains the directory holds thousands of tiny
    * `batch_id=N` partitions and every gate read lists them all — the
    * classic streaming small-files decay. This pass consolidates every
    * partition with `batch_id < beforeBatch` (pass the CURRENT batch
    * id: the one batch `foreachBatch` may still replay is never
    * touched, so the same-batchId overwrite contract is preserved).
    * MISUSE CONSEQUENCE — if `beforeBatch` EXCEEDS the true current
    * batch id (or this is called mid-drain), the still-replayable
    * batch's partition gets folded into the consolidated copy, and a
    * subsequent `foreachBatch` replay re-creates `batch_id=N`
    * ALONGSIDE it: the output corpus double-counts that batch's rows
    * until the next healing pass. Prefer the drains' `compactEvery`
    * knob, which derives the bound from the live `batchId` inside
    * `foreachBatch` and cannot get this wrong; when calling manually,
    * do it strictly BETWEEN drains with `beforeBatch` = the id the
    * NEXT drain will use (the checkpoint's last committed batch + 1).
    * The consolidated mass is written under a NEGATIVE id that encodes its
    * coverage: `batch_id = -(M + 2)` consolidates all batches with id
    * ≤ M. Readers are unaffected — the row set is unchanged, and
    * [[bandIndex]]'s current-batch exclusion compares against a
    * non-negative id, which a consolidated partition never carries.
    *
    * Crash-safe by self-healing, not atomicity: the consolidated
    * partition is written BEFORE its sources are deleted, so a crash
    * inside the window leaves covered rows visible twice; the next
    * call (or drain-time healing via this method) deletes any
    * partition whose id is ≤ some negative partition's coverage before
    * doing new work. For the band index the duplicate window is
    * semantically invisible (suppression is a semi-join on keys); for
    * an OUTPUT corpus, run the pass between drains and re-run it after
    * a crash before reading.
    *
    * Trigger policy: cheap enough to call after every drain (it
    * no-ops below 2 consolidatable partitions); at scale, trigger when
    * the positive-partition count exceeds the number of files a gate
    * read should list (e.g. 64) — the pass costs one read + one write
    * of the consolidated mass, `targetFiles` bounds the output file
    * count. Returns true iff a consolidation was performed.
    */
  /** @param aggregate applied to the unioned covered rows before the
    *   consolidated write — identity for row layouts (corpus, band
    *   index); sketch layouts pass their merge (CMS counter re-sum,
    *   KMV buffer re-merge) so the consolidated partition keeps the
    *   sketch's FIXED size instead of accreting one row set per drain.
    *   Must be a pure merge (output row set ≡ what readers would
    *   derive from the inputs) or replay reads change.
    */
  def compactBatches(
      spark: SparkSession, dir: String, beforeBatch: Long,
      targetFiles: Int = 1,
      aggregate: DataFrame => DataFrame = identity): Boolean = {
    require(targetFiles >= 1, s"targetFiles=$targetFiles must be positive")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    def parts(): Seq[(Long, org.apache.hadoop.fs.Path)] =
      fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("batch_id="))
          scala.util.Try(name.stripPrefix("batch_id=").toLong)
            .toOption.map(_ -> st.getPath)
        else None
      }
    // heal a crashed prior pass: anything covered by a negative
    // partition is a leftover source — delete it before new work
    val all = parts()
    val maxCover = all.collect { case (id, _) if id < 0 => -id - 2 }
      .foldLeft(-1L)(math.max)
    for ((id, p) <- all
         if (id >= 0 && id <= maxCover) || (id < 0 && -id - 2 < maxCover))
      fs.delete(p, true)
    val sources = parts().filter { case (id, _) =>
      id < 0 || id < beforeBatch }
    if (sources.size <= 1) return false
    val newCover = sources.map(_._1).filter(_ >= 0)
      .foldLeft(maxCover)(math.max)
    // read via basePath so the partition column materializes, drop it,
    // and write the union under the explicit consolidated dir (the
    // same no-column-in-data layout the drains write)
    aggregate(spark.read.option("basePath", dir)
        .parquet(sources.map(_._2.toString): _*)
        .drop("batch_id"))
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$dir/batch_id=${-(newCover + 2)}")
    sources.foreach { case (_, p) => fs.delete(p, true) }
    true
  }

  /** The persisted band-key index relation as batch `currentBatch`
    * must see it: every EARLIER batch's keys, excluding the current
    * batch's own partition. The exclusion does two jobs at once — on
    * a crash-replay it reproduces the exact pre-crash gate input (so
    * the replayed batch re-admits identically even though its own
    * partition already holds keys), and it keeps the suppression
    * join's scan disjoint from the partition the same batch is about
    * to OVERWRITE (a lazy self-read of files the overwrite deletes is
    * a FILE_NOT_EXIST at action time). Empty but correctly typed
    * before the first drain has written anything.
    */
  /** CHUNK-DEDUPED ingest — content-defined storage dedup running in
    * the stream: each drain chunks its novel documents with
    * [[graft.operators.Dedup.cdcChunks]] (insertion-robust boundaries,
    * so a re-crawled page with an edited header still shares every
    * downstream chunk with the stored copy), keeps only chunks whose
    * fingerprint is NOT already in the chunk store, and writes two
    * batchId-keyed exactly-once layouts: `chunkStoreDir` gains the
    * batch's NOVEL chunk bodies (`chunk_fp, n_tokens, chunk_text` —
    * one copy per distinct fingerprint, ever), `manifestDir` gains
    * every document's full recipe (`url, chunk_idx, chunk_fp`).
    * [[readChunkedCorpus]] reassembles the exact corpus from the two.
    *
    * Crash contract (the [[runFuzzy]] argument): the store partition
    * writes FIRST; a replay re-reads the store WITHOUT the current
    * batch's partition, so the novelty gate re-decides identically and
    * both overwrites are rewrites. Compaction consolidates either
    * layout with the identity aggregate — cross-batch fingerprints are
    * unique by construction (a later batch's copy was gated out).
    */
  def runChunked(
      spark: SparkSession, warcDir: String, checkpointDir: String,
      manifestDir: String, chunkStoreDir: String,
      glob: String = "*.warc*", divisor: Int = 8,
      compactEvery: Int = 0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      picksDir: String = null,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20): StreamingQuery = {
    // the q193 sweep's pick configures the chunker (resolved once at
    // stream start, [[readPicks]]' contract — the chunk store's
    // fingerprints are divisor-dependent, so a mid-stream change
    // would stop old chunks deduplicating against new ones); the
    // q191 pick configures the dup-mass telemetry threshold
    val kPicks = resolvePicks(spark, picksDir)
    val eDivisor = pickInt(kPicks, "cdc_divisor", divisor)
    val eDupThr = kPicks.getOrElse("neardup_jaccard", dupMassThreshold)
    pinLayout(spark, chunkStoreDir, "divisor" -> eDivisor)
    docStream(spark, warcDir, glob)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        chunkedBatch(spark, manifestDir, chunkStoreDir, eDivisor,
          compactEvery, dupMassDir, dupMassShingleN, eDupThr,
          sketchDir, sketchDepth, sketchWidth, kmvDir, kmvK,
          tokenStatsDir, statsMinQualityTokens)(
          batch, batchId)
      }
      .start()
  }

  /** One [[runChunked]] micro-batch, factored out for the replay spec. */
  private[streaming] def chunkedBatch(
      spark: SparkSession, manifestDir: String, chunkStoreDir: String,
      divisor: Int, compactEvery: Int = 0,
      dupMassDir: String = null,
      dupMassShingleN: Int = 3, dupMassThreshold: Double = 0.7,
      sketchDir: String = null,
      sketchDepth: Int = 4, sketchWidth: Int = 1024,
      kmvDir: String = null, kmvK: Int = 256,
      tokenStatsDir: String = null,
      statsMinQualityTokens: Int = 20)(
      batch: DataFrame, batchId: Long): Unit = {
    val docs = oneRowPerUrl(batch)
    if (!docs.isEmpty) graft.operators.CacheRegistry.scope {
      val chunks = graft.operators.CacheRegistry.track(
        graft.operators.Dedup.cdcChunks(
          docs.select("url", "text"), "url", "text", divisor,
          keepText = true).persist())
      // batch-local first occurrence per fingerprint (min (url, idx)
      // rep — deterministic), then the cross-batch novelty gate
      val localFirst = chunks
        .groupBy(col("chunk_fp"))
        .agg(min(struct(col("url"), col("chunk_idx"), col("n_tokens"),
          col("chunk_text"))).as("__rep"))
        .select(col("chunk_fp"), col("__rep.n_tokens").as("n_tokens"),
          col("__rep.chunk_text").as("chunk_text"))
      val novel = localFirst.join(
        knownChunks(spark, chunkStoreDir, batchId), Seq("chunk_fp"),
        "left_anti")
      novel.write.mode("overwrite")
        .parquet(s"$chunkStoreDir/batch_id=$batchId")
      // ingest_batch is a DATA column (not just the partition id): a
      // same-url re-crawl with edited content lands a SECOND recipe for
      // that url, and reassembly must version them — by a column that
      // SURVIVES compaction, which rewrites old partitions under one
      // negative coverage id
      chunks.select("url", "chunk_idx", "chunk_fp")
        .withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite").parquet(s"$manifestDir/batch_id=$batchId")
      // token-sketch telemetry over the drain's DOCUMENTS — what this
      // variant manifests (the corpus readChunkedCorpus reassembles),
      // the same document-level basis as its dup-mass histogram: the
      // storage-side chunk dedup changes what is STORED, not what the
      // corpus contains, so the token telemetry must not be filtered
      // by chunk novelty
      writeTokenSketches(docs, sketchDir, sketchDepth, sketchWidth,
        kmvDir, kmvK, batchId)
      // per-source token stats over the drain's DOCUMENTS — what the
      // chunked variant manifests (storage-side chunk dedup changes
      // what is STORED, not what the corpus contains)
      writeTokenStats(docs, tokenStatsDir, statsMinQualityTokens,
        batchId)
      // per-drain dup-mass telemetry over the drain's DOCUMENTS (what
      // this variant manifests — its storage-side chunk dedup is a
      // different axis than document near-dup mass, which is exactly
      // why a chunked ingest still wants the document histogram)
      if (dupMassDir != null)
        writeDupMass(docs, dupMassDir, dupMassShingleN,
          dupMassThreshold, batchId)
      maybeCompact(spark,
        Seq(chunkStoreDir, manifestDir) ++ Option(dupMassDir),
        compactEvery, batchId)
      compactSketchDirs(spark, sketchDir, kmvDir, kmvK, compactEvery,
        batchId, statsDir = tokenStatsDir)
    }
  }

  /** The corpus reassembled from the chunk store: every manifest row
    * joins its stored chunk body (an equi-join on the fingerprint —
    * the store side is the small, deduplicated relation), each
    * document VERSION's chunks concatenate in `chunk_idx` order, and
    * the LATEST version per url (max `ingest_batch`) wins — a same-url
    * re-crawl with edited content is a new recipe, never an interleave
    * of two versions' chunks. Byte-exact for space-tokenized text by
    * the CDC partition property.
    */
  def readChunkedCorpus(spark: SparkSession, manifestDir: String,
      chunkStoreDir: String): DataFrame =
    spark.read.parquet(manifestDir)
      .join(spark.read.parquet(chunkStoreDir)
        .select("chunk_fp", "chunk_text"), Seq("chunk_fp"))
      .groupBy(col("url"), col("ingest_batch"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_idx"),
          col("chunk_text")))),
        x => x.getField("chunk_text"))).as("__text"))
      .groupBy(col("url"))
      .agg(max(struct(col("ingest_batch"), col("__text"))).as("__v"))
      .select(col("url"), col("__v.__text").as("text"))

  private def knownChunks(spark: SparkSession, dir: String,
      currentBatch: Long): DataFrame =
    try {
      val idx = spark.read.parquet(dir)
      (if (idx.columns.contains("batch_id"))
         idx.filter(col("batch_id") =!= lit(currentBatch))
       else idx)
        .select("chunk_fp")
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("chunk_fp",
              org.apache.spark.sql.types.StringType))))
    }

  private def bandIndex(spark: SparkSession, dir: String,
      currentBatch: Long): DataFrame =
    try {
      val idx = spark.read.parquet(dir)
      (if (idx.columns.contains("batch_id"))
         idx.filter(col("batch_id") =!= lit(currentBatch))
       else idx)
        .select("fp", "band_id", "band_hash")
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("fp",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("band_id",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("band_hash",
              org.apache.spark.sql.types.LongType))))
    }
}
