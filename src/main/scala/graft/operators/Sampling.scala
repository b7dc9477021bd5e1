package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — reproducible train/test splits
  * that survive re-runs, repartitioning, and engine changes (unlike
  * seed-based `sample()`, whose output depends on partitioning). Bucket =
  * first hex nibble of md5(key) → 16 stable buckets.
  */
object Sampling {

  /** NULL keys bucket as the empty string — consistently kept/split
    * rather than silently dropped by a null comparison.
    */
  def stableBucket(key: Column): Column =
    conv(substring(md5(coalesce(key.cast("string"), lit(""))), 1, 1), 16, 10)
      .cast("int")

  /** Keep rows whose bucket < `keepBuckets` (of 16) — e.g. 2 → 12.5 %. */
  def stableSample(df: DataFrame, keyCol: String, keepBuckets: Int): DataFrame =
    df.filter(stableBucket(col(keyCol)) < keepBuckets)

  /** Tagged train/test split at a bucket boundary. */
  def trainTestSplit(df: DataFrame, keyCol: String, testBuckets: Int): DataFrame =
    df.withColumn("split",
      when(stableBucket(col(keyCol)) < testBuckets, lit("test"))
        .otherwise(lit("train")))

  /** Leakage-safe train/test split: near-duplicate CLUSTERS never
    * straddle the boundary (a test doc whose near-dup sits in train is
    * test-set contamination). Docs bucket by their cluster
    * REPRESENTATIVE (connected component of the pair relation; the doc
    * itself when unpaired), so every member of a duplicate group lands
    * in the same split — and the split stays content-hash deterministic.
    */
  def leakageSafeSplit(
      df: DataFrame, keyCol: String, pairs: DataFrame,
      idACol: String, idBCol: String, testBuckets: Int): DataFrame = {
    val comp = Components.connectedComponents(pairs, idACol, idBCol)
      .select(col("id").as(keyCol), col("component"))
    df.join(comp, Seq(keyCol), "left")
      .withColumn("split",
        when(stableBucket(coalesce(col("component"), col(keyCol))) < testBuckets,
          lit("test")).otherwise(lit("train")))
      .drop("component")
  }

  /** Finer content-hash bucket (0..255 — two hex digits of md5) for
    * rates that need better than 1/16 resolution.
    */
  def stableBucket256(key: Column): Column =
    conv(substring(md5(coalesce(key.cast("string"), lit(""))), 1, 2), 16, 10)
      .cast("int")

  /** Rebalance a corpus to TARGET source proportions (the data-mixture
    * step of a pretraining pipeline: "the training set should be 50 % en,
    * 25 % de, 25 % fr"): per-source counts (one agg, |sources| rows)
    * determine the largest feasible total N = min(count_s / target_s),
    * then each source keeps a deterministic content-hash fraction
    * ≈ target_s·N/count_s. floor() everywhere, so the thresholds are
    * reproducible in any engine's double arithmetic; kept counts are
    * hash-uniform approximations of the targets (exact-count sampling
    * would need a global sort). Sources with no target are dropped.
    */
  def mixToTarget(
      df: DataFrame, keyCol: String, sourceCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.values.forall(t => t > 0 && t <= 1),
      "targets must be positive fractions")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targets.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    if (present.isEmpty) return df.limit(0)
    val total = present.map { case (s, t) => counts(s) / t }.min
    val thresholds = present.map { case (s, t) =>
      s -> math.floor(t * total / counts(s) * 256).toInt
    }
    val thr = thresholds.foldLeft(lit(0)) { case (acc, (s, th)) =>
      when(col(sourceCol) === s, lit(th)).otherwise(acc)
    }
    df.filter(stableBucket256(col(keyCol)) < thr)
  }

  /** TEMPERATURE-weighted source mixing (the multilingual rebalancing
    * rule of mT5 / XLM-R: sampling weight ∝ count^α, α ∈ (0, 1] — α=1
    * keeps natural proportions, smaller α upsamples the tail relative
    * to the head): like [[mixToTarget]] but the targets derive from
    * the corpus itself, so no explicit proportion table is needed.
    * Implemented in the algebraically CANCELED form — the per-source
    * keep threshold reduces to `⌊256·(min_c/c_s)^(1−α)⌋` (the
    * smallest source keeps everything, larger sources downsample by
    * their count ratio to the α−1 power) — because the canceled form
    * is what an independent engine can replay bit-exactly: exponents
    * on the [[powExact]] ladder (α ∈ {0, .25, .5, .75, 1}) evaluate
    * through sqrt compositions of an identical double quotient,
    * correctly rounded per IEEE 754 in BOTH engines — and through the
    * SAME function [[temperatureSweep]] prices with, so the sweep's
    * published thresholds are bit-identical to what this gate keeps.
    * Other α go through `pow`, whose last-ulp rounding is NOT
    * specified identically across libm implementations — a threshold
    * can flip by one bucket in ~2⁻⁵² of configurations; fine for
    * production mixing, excluded from the exactness gate by design.
    * Same per-row content-hash filter as [[mixToTarget]]: no shuffle,
    * reproducible across runs, engines, and partitionings.
    */
  def temperatureMix(
      df: DataFrame, keyCol: String, sourceCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha must be in (0, 1]")
    // key read + comparison via an explicit string cast so non-string
    // source codes (int domains) work; the cast is deterministic both
    // sides of the when
    val counts = df.groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.limit(0)
    val minC = counts.values.min.toDouble
    val thr = counts.foldLeft(lit(0)) { case (acc, (s, c)) =>
      when(col(sourceCol).cast("string") === s,
        lit(math.floor(256.0 * powExact(1.0 - alpha, minC / c)).toInt))
        .otherwise(acc)
    }
    df.filter(stableBucket256(col(keyCol)) < thr)
  }

  /** The shared exponent ladder of the temperature family:
    * e ∈ {0, 0.25, 0.5, 0.75, 1} evaluate through IEEE-exact sqrt
    * compositions (correctly rounded per IEEE 754, so cross-engine
    * bit-exact — the catalog gate); anything else goes through libm
    * `pow` (last-ulp unspecified, excluded from the exactness gate).
    * ONE function used by both [[temperatureMix]] (the gate) and
    * [[temperatureSweep]] (the knob-pricing read) — if the two evolved
    * separate ladders, a floor(256·x) boundary case could put the
    * sweep's published threshold one bucket off what the gate actually
    * keeps.
    */
  private[graft] def powExact(e: Double, x: Double): Double =
    if (e == 0.0) 1.0
    else if (e == 0.25) math.sqrt(math.sqrt(x))
    else if (e == 0.5) math.sqrt(x)
    else if (e == 0.75) math.sqrt(x) * math.sqrt(math.sqrt(x))
    else if (e == 1.0) x
    else math.pow(x, e)

  /** The α = 0.5 keep-bucket threshold as a COLUMN expression —
    * `floor(256·sqrt(minCount/count))` — published so audits (q182)
    * derive their target shares from the same formula
    * [[temperatureMix]] gates on instead of re-deriving it inline (the
    * permConstants/planeVectorValues pattern: the owning module
    * publishes its constants; SamplingSpec pins column-vs-driver
    * equality). Both sides are the identical IEEE sqrt of the identical
    * double quotient, so the values match bit-for-bit.
    */
  def sqrtKeepThreshold(minCount: Column, count: Column): Column =
    floor(lit(256.0) * sqrt(minCount / count))

  /** Temperature SWEEP — the knob-picking read for [[temperatureMix]]:
    * for each α in the ladder, the per-source keep threshold and the
    * realized kept counts and shares, computed WITHOUT rescanning the
    * corpus per α: the corpus aggregates ONCE into the
    * (source, bucket) histogram (≤ 256·|sources| rows), thresholds are
    * derived per (α, source) on the driver from the same per-source
    * counts [[temperatureMix]] collects, and each ladder point is a
    * broadcast join over the bounded histogram. Exponents e = 1−α in
    * {0, 0.25, 0.5, 0.75, 1} evaluate through IEEE-exact sqrt
    * compositions (cross-engine bit-exact — the catalog gate); other α
    * go through libm `pow` (fine for production mixing, excluded from
    * the exactness gate — the [[temperatureMix]] caveat). Output one
    * row per (α, source): `(alpha, source, n_docs, thr, n_kept,
    * kept_share)` with the share round-6 of that α's total kept.
    */
  def temperatureSweep(
      df: DataFrame, keyCol: String, sourceCol: String,
      alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a >= 0 && a <= 1),
      s"alphas=$alphas must be non-empty and within [0, 1]")
    val spark = df.sparkSession
    // source cast to string in the histogram projection so any key
    // type (int source codes) flows through the driver map, the thrDf
    // schema, and the join without a ClassCastException
    val hist = CacheRegistry.track(
      df.select(col(sourceCol).cast("string").as("source"),
          stableBucket256(col(keyCol)).as("bucket"))
        .groupBy("source", "bucket").agg(count(lit(1)).as("n"))
        .persist())
    val counts = hist.groupBy("source").agg(sum(col("n")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("alpha",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_docs",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("thr",
        org.apache.spark.sql.types.LongType)))
    if (counts.isEmpty)
      return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .withColumn("n_kept", lit(0L))
        .withColumn("kept_share", lit(0.0))
    val minC = counts.values.min.toDouble
    val thrRows = for (a <- alphas; (s, c) <- counts.toSeq) yield
      org.apache.spark.sql.Row(a, s, c,
        math.floor(256.0 * powExact(1.0 - a, minC / c)).toLong)
    val thrDf = spark.createDataFrame(
      spark.sparkContext.parallelize(thrRows, 1), schema)
    val h = hist.select(col("source").as("__hsrc"), col("bucket"),
      col("n"))
    // the hint goes on the RIGHT (buildable) side of the left join —
    // broadcasting the preserved side is not a thing and Spark would
    // silently drop that hint
    val kept = thrDf
      .join(broadcast(h), col("source") === col("__hsrc") &&
        col("bucket") < col("thr"), "left")
      .groupBy("alpha", "source", "n_docs", "thr")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_kept"))
    val totals = kept.groupBy("alpha").agg(sum(col("n_kept")).as("__tot"))
    kept.join(broadcast(totals), Seq("alpha"))
      .select(col("alpha"), col("source"), col("n_docs"), col("thr"),
        col("n_kept"),
        round(col("n_kept").cast("double") / col("__tot").cast("double"), 6)
          .as("kept_share"))
  }

  /** [[temperatureSweep]] with the per-source counts DISCOUNTED by an
    * externally measured duplication mass before the thresholds
    * derive — the dedup→mixing connector: a mirror-crawl source must
    * not buy sampling mass with duplicate counts, and the discount
    * comes from a MEASUREMENT (the q204 closure / the live ingest's
    * dup-mass telemetry), not from actually draining the corpus.
    * `effective` is one row per source, `(source, eff_docs)` —
    * typically `n_docs − n_removed`, what a keep-one-per-cluster
    * drain would leave. Thresholds are
    * `⌊256·(min_eff/eff)^(1−α)⌋` over the sources with `eff > 0`
    * (same [[powExact]] ladder and bucket rule as the undiscounted
    * sweep — the gate this sweep prices keeps bit-identical sets);
    * a source with `eff ≤ 0` is pure removable mass and gates to
    * threshold 0 — kept count zero at every α. Sources absent from
    * `effective` keep their RAW count (no measured discount, no
    * silent drop). The kept counts are measured over `df` ITSELF —
    * the actual, un-drained corpus the gate would run on. Output one
    * row per (α, source): `(alpha, source, n_docs, eff_docs, thr,
    * n_kept, kept_share)`.
    *
    * Scale shape: identical to [[temperatureSweep]] — one
    * (source, bucket) histogram aggregation of the corpus (≤
    * 256·|sources| rows), a bounded driver read of the per-source
    * counts plus the |sources|-row `effective` relation, broadcast
    * joins for each ladder point.
    */
  def temperatureSweepDiscounted(
      df: DataFrame, keyCol: String, sourceCol: String,
      alphas: Seq[Double], effective: DataFrame): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a >= 0 && a <= 1),
      s"alphas=$alphas must be non-empty and within [0, 1]")
    val spark = df.sparkSession
    val hist = CacheRegistry.track(
      df.select(col(sourceCol).cast("string").as("source"),
          stableBucket256(col(keyCol)).as("bucket"))
        .groupBy("source", "bucket").agg(count(lit(1)).as("n"))
        .persist())
    val counts = hist.groupBy("source").agg(sum(col("n")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val effMap = effective
      .select(col("source").cast("string"), col("eff_docs").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("alpha",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_docs",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("eff_docs",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("thr",
        org.apache.spark.sql.types.LongType)))
    if (counts.isEmpty)
      return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .withColumn("n_kept", lit(0L))
        .withColumn("kept_share", lit(0.0))
    val eff = counts.map { case (s, c) => s -> effMap.getOrElse(s, c) }
    val positive = eff.values.filter(_ > 0)
    val minE = if (positive.isEmpty) 0.0 else positive.min.toDouble
    val thrRows = for (a <- alphas; (s, c) <- counts.toSeq) yield
      org.apache.spark.sql.Row(a, s, c, math.max(eff(s), 0L),
        if (eff(s) <= 0) 0L
        else math.floor(256.0 * powExact(1.0 - a, minE / eff(s))).toLong)
    val thrDf = spark.createDataFrame(
      spark.sparkContext.parallelize(thrRows, 1), schema)
    val h = hist.select(col("source").as("__hsrc"), col("bucket"),
      col("n"))
    val kept = thrDf
      .join(broadcast(h), col("source") === col("__hsrc") &&
        col("bucket") < col("thr"), "left")
      .groupBy("alpha", "source", "n_docs", "eff_docs", "thr")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_kept"))
    val totals = kept.groupBy("alpha").agg(sum(col("n_kept")).as("__tot"))
    kept.join(broadcast(totals), Seq("alpha"))
      .select(col("alpha"), col("source"), col("n_docs"), col("eff_docs"),
        col("thr"), col("n_kept"),
        // share guard: when EVERY source measures eff_docs <= 0, all
        // thresholds are 0 and __tot is 0 — the documented "kept count
        // zero at every alpha" case must read share 0.0, not 0/0 = NaN
        when(col("__tot") === 0L, lit(0.0))
          .otherwise(round(
            col("n_kept").cast("double") / col("__tot").cast("double"), 6))
          .as("kept_share"))
  }

  /** Epoch/repeat PLANNER — the decision a DATA-CONSTRAINED training
    * run makes before any sampling (Muennighoff et al. 2023-style
    * repeat accounting: when the token budget exceeds the unique data,
    * the question is how many EPOCHS of each source, under diminishing
    * returns per repeat). Every mixing tier here ([[temperatureMix]],
    * [[mixToTarget]], UniMax) assumes single-pass sampling; this is the
    * layer above them.
    *
    * Model: repeat k of source s is worth `weight_ppm(s) · δ^(k-1)`
    * per token with δ = 1/2 — a geometric diminishing-returns discount
    * whose per-layer values are EXACT INTEGERS after scaling by
    * 2^(maxEpochs-1) (`weight_ppm · 2^(maxEpochs-k)`), so the greedy
    * waterfill is replayable bit-exactly by any engine: sort the
    * |sources|·maxEpochs layer relation by (value DESC, source, epoch)
    * — a strict total order — and fill each layer's `unique_tokens`
    * until the budget runs out; the boundary layer takes the
    * remainder. Zero-weight sources sort last (budget still fills them
    * once everything valued is exhausted — a fixed-compute run spends
    * its budget). This is the optimal allocation for the model
    * (marginal values are layer-constant, so greedy-by-value is
    * exchange-optimal), and it is pure closed-form arithmetic over the
    * per-source count relation — dozens of rows, no corpus scan.
    *
    * `perSource` contract: one row per source with columns
    * `source` (string), `unique_tokens` (long > 0 — the post-dedup
    * available tokens), `weight_ppm` (long in [0, 1e6] — per-source
    * quality weight in parts-per-million, integer so the value ladder
    * stays exact). Output one row per source:
    * `(source, unique_tokens, weight_ppm, tokens_alloc, full_epochs,
    * frac_b256, epochs_r6)` — `full_epochs` whole passes,
    * `frac_b256 = ⌊256·partial/unique⌋` the md5-bucket threshold
    * [[epochRealize]] gates the fractional pass on, `epochs_r6` the
    * display ratio. The layer window is over a bounded relation
    * (|sources|·maxEpochs rows), never the corpus. δ is a parameter on
    * [[epochPlanDiscounted]] (any rational ≤ 1, same exact-integer
    * ladder); this entry point IS that function at δ = 1/2.
    */
  def epochPlan(perSource: DataFrame, budgetTokens: Long,
      maxEpochs: Int): DataFrame =
    epochPlanDiscounted(perSource, budgetTokens, maxEpochs,
      deltaNumer = 1L, deltaDenom = 2L)

  /** [[epochPlan]] with the diminishing-returns discount δ EXPLICIT —
    * the planner's last un-priced assumption: repeat k of source s is
    * worth `weight_ppm(s) · δ^(k-1)` per token with
    * δ = deltaNumer/deltaDenom ∈ (0, 1]. Scaling every layer by
    * deltaDenom^(maxEpochs-1) keeps the value ladder EXACT-INTEGER for
    * any rational δ: `value = weight_ppm · deltaNumer^(k-1) ·
    * deltaDenom^(maxEpochs-k)` (δ = 1/2 recovers [[epochPlan]]'s
    * power-of-two ladder; δ = 1 is the no-discount control, where only
    * the quality weight ranks layers and the (source, epoch) tiebreak
    * decides within a weight class). The per-epoch factors are
    * precomputed BigInt-checked long literals indexed by epoch — never
    * a float `pow` — so the greedy waterfill stays replayable
    * bit-exactly by any engine, and the overflow ceiling is enforced
    * up front: `1e6 · deltaDenom^(maxEpochs-1) < 2^63` (δ = 1/2 at the
    * full maxEpochs = 32 passes; coarser denominators need fewer
    * epochs). `frac_b256` widens through DECIMAL(38,0), so the
    * 256·partial product is exact for any sub-2^63 token count — a
    * plain long product would overflow ANSI mode past 2^55 tokens
    * (≈ 36 PB of text) in a function that names every other ceiling.
    */
  def epochPlanDiscounted(perSource: DataFrame, budgetTokens: Long,
      maxEpochs: Int, deltaNumer: Long, deltaDenom: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens >= 0, s"budgetTokens=$budgetTokens must be >= 0")
    require(maxEpochs >= 1 && maxEpochs <= 32,
      s"maxEpochs=$maxEpochs must be in [1, 32]")
    require(deltaNumer >= 1 && deltaDenom >= deltaNumer,
      s"delta=$deltaNumer/$deltaDenom must be a rational in (0, 1]")
    require(BigInt(1000000) * BigInt(deltaDenom).pow(maxEpochs - 1) <
        (BigInt(1) << 63),
      s"delta denominator $deltaDenom at maxEpochs=$maxEpochs overflows " +
        "the exact value ladder: need 1e6 * deltaDenom^(maxEpochs-1) < 2^63")
    // exact per-epoch layer factors, BigInt-built then narrowed (the
    // require above guarantees the narrowing is lossless)
    val factors = (1 to maxEpochs).map(k =>
      (BigInt(deltaNumer).pow(k - 1) * BigInt(deltaDenom).pow(maxEpochs - k))
        .toLong)
    val layers = perSource
      .select(col("source").cast("string").as("source"),
        col("unique_tokens").cast("long").as("unique_tokens"),
        col("weight_ppm").cast("long").as("weight_ppm"))
      .withColumn("epoch", explode(sequence(lit(1), lit(maxEpochs))))
      // the ppm contract is enforced by name INSIDE the ladder: an
      // out-of-range weight (raw counts instead of ppm, or a negative)
      // would otherwise surface as a mid-job ANSI ARITHMETIC_OVERFLOW
      // — or silently sort below the zero-weight tier — instead of
      // telling the caller what to fix (the firstFitBlocks id-span
      // discipline; the overflow requires above are only safe GIVEN
      // weight_ppm <= 1e6)
      .withColumn("value_scaled",
        expr(s"CASE WHEN weight_ppm BETWEEN 0 AND 1000000 THEN " +
          s"weight_ppm * element_at(array(${factors.mkString("L,")}L), " +
          "epoch) " +
          "ELSE raise_error(concat('epochPlan: weight_ppm must be in " +
          "[0, 1000000] ppm, got ', CAST(weight_ppm AS STRING))) END"))
    val ord = Window
      .orderBy(col("value_scaled").desc, col("source").asc, col("epoch").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    layers
      .withColumn("cum_prev",
        coalesce(sum(col("unique_tokens")).over(ord), lit(0L)))
      .withColumn("layer_alloc",
        greatest(lit(0L), least(col("unique_tokens"),
          lit(budgetTokens) - col("cum_prev"))))
      .groupBy("source", "unique_tokens", "weight_ppm")
      .agg(sum(col("layer_alloc")).as("tokens_alloc"),
        sum(when(col("layer_alloc") === col("unique_tokens"), 1L)
          .otherwise(0L)).as("full_epochs"))
      .withColumn("frac_b256",
        expr("CAST((CAST(256 AS DECIMAL(38,0)) * " +
          "(tokens_alloc - full_epochs * unique_tokens)) " +
          "DIV unique_tokens AS BIGINT)"))
      .withColumn("epochs_r6",
        round(col("tokens_alloc").cast("double") /
          col("unique_tokens").cast("double"), 6))
  }

  /** The suffix-settling PLAN-COMMIT rule over a ladder of epoch
    * plans — the q213 decision as a library operator, so the LIVE
    * side can run it too (snapshot [[graft.streaming.CorpusStream
    * .planFromTokenStats]] after each drain and feed the snapshots
    * here): per source, `settled_at_batches` = the earliest landing
    * from which the source's `full_epochs` equals the FINAL plan's at
    * every subsequent landing — a suffix rule, not a first-hit rule
    * (a landing-1 coincidence that flaps away at landing 2 has not
    * settled; committing compute on it is the mistake the rule
    * exists to prevent), with absence from an early plan counting as
    * unsettled (a plan that has never seen the source cannot have
    * committed to it). `flapped` marks the non-monotone shape (an
    * agreeing landing strictly before a later disagreeing one).
    * `commit_batches` = max settled_at over sources rides every row
    * — the earliest landing after which the WHOLE mixture's plan is
    * final. The identity gated is `gateCol` — `full_epochs` by
    * default (q213: plan identity; the fractional epoch can still
    * move under an identical full_epochs — price that residual in
    * tokens, q215's read), or any long-valued per-source column:
    * gate `realized_tokens` (q217) to demand EMISSION identity — the
    * strictly stronger commit that closes q215's caveat — or
    * `tokens_alloc` for the telemetry-side allocation gate.
    *
    * `plans`: (landing id, plan) pairs — any relation carrying
    * `source` and the gate column (an [[epochPlan]] output, a
    * telemetry-derived plan, or a realization rollup); landing ids
    * must be distinct, compare by `<`, and the largest is the
    * reference. The final-value column in the output is named
    * `<gateCol>_final`. Bounded arithmetic end to end: the grid is
    * |ladder|·|sources| rows.
    */
  def planCommitRule(plans: Seq[(Long, DataFrame)],
      gateCol: String = "full_epochs"): DataFrame = {
    require(plans.nonEmpty, "planCommitRule needs at least one plan")
    val ladder = plans.map(_._1)
    require(ladder.distinct.size == ladder.size,
      s"landing ids must be distinct, got $ladder")
    val finalNb = ladder.max
    val finalCol = s"${gateCol}_final"
    val spark = plans.head._2.sparkSession
    import spark.implicits._
    val tagged = plans.map { case (nb, p) =>
      p.select(lit(nb).as("__nb"),
        col("source").cast("string").as("source"),
        col(gateCol).cast("long").as("__fe"))
    }.reduce(_ unionAll _)
    val fin = tagged.filter(col("__nb") === finalNb)
      .select(col("source"), col("__fe").as(finalCol))
    // the (landing × final-source) grid — a LEFT join so a source
    // missing from an early plan reads NOT ok at that landing
    val flags = ladder.toDF("__nb").crossJoin(fin)
      .join(tagged, Seq("__nb", "source"), "left")
      .select(col("__nb"), col("source"), col(finalCol),
        (col("__fe").isNotNull &&
          col("__fe") === col(finalCol)).as("__ok"))
    // last disagreeing landing per source (null = never disagreed);
    // settled_at = the smallest landing past it, flapped = an
    // agreeing landing strictly before it
    val per = flags
      .join(flags.groupBy("source")
        .agg(max(when(!col("__ok"), col("__nb"))).as("__last_bad")),
        Seq("source"))
      .groupBy(col("source"), col(finalCol),
        col("__last_bad"))
      .agg(
        min(when(col("__last_bad").isNull ||
          col("__nb") > col("__last_bad"), col("__nb")))
          .as("settled_at_batches"),
        max(when(col("__ok") && col("__last_bad").isNotNull &&
          col("__nb") < col("__last_bad"), 1L).otherwise(0L))
          .as("flapped"))
    per.crossJoin(broadcast(
        per.agg(max(col("settled_at_batches")).as("commit_batches"))))
      .select(col("source"), col("settled_at_batches"), col("flapped"),
        col(finalCol), col("commit_batches"))
  }

  /** The corpus-side keep rule of [[epochPlan]]: every doc of source s
    * repeats `full_epochs(s)` times, plus once more when its md5
    * bucket-of-256 falls under `frac_b256(s)` — the same deterministic
    * content-hash gate as every sampling tier here, so the realized
    * fractional pass is reproducible across engines, runs, and
    * partitionings, and realized tokens track `tokens_alloc` to bucket
    * granularity. Pure per-row broadcast-join + filter arithmetic — no
    * shuffle, scan-speed at any corpus size. Emits the input columns
    * plus `repeats` (long, possibly 0 — budget exhausted before this
    * source's first pass); sources absent from the plan are dropped.
    */
  def epochRealize(df: DataFrame, keyCol: String, sourceCol: String,
      plan: DataFrame): DataFrame =
    df.join(
        broadcast(plan.select(col("source").as("__psrc"),
          col("full_epochs"), col("frac_b256"))),
        col(sourceCol).cast("string") === col("__psrc"))
      .withColumn("repeats",
        col("full_epochs") +
          when(stableBucket256(col(keyCol)) < col("frac_b256"), 1L)
            .otherwise(0L))
      .drop("__psrc", "full_epochs", "frac_b256")

  /** Stratified deterministic sampling: a different keep-rate per stratum
    * value (16ths), e.g. downsample a dominant language while keeping the
    * long tail whole — the corpus-rebalancing step of a training-data
    * pipeline. Strata not in `rates` keep `defaultBuckets`. Content-hash
    * buckets, so the sample is reproducible across engines, runs, and
    * partitionings; a pure per-row filter, so it pipelines at scan speed
    * over any corpus size (no shuffle).
    */
  def stratifiedSample(
      df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultBuckets: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultBuckets)) { case (acc, (value, buckets)) =>
      when(col(strataCol) === value, lit(buckets)).otherwise(acc)
    }
    df.filter(stableBucket(col(keyCol)) < rate)
  }

  /** Per-group quota capping — the domain-balancing step of a web-corpus
    * pipeline (CommonCrawl-style: no domain may contribute more than
    * `quota` documents). Within each `groupCol`, rows are ranked by a
    * content hash of their key (deterministic "random" order — NOT
    * insertion or id order, which would bias toward old documents) and
    * only the first `quota` survive. One shuffle on the group key; the
    * rank window never materializes more than a group's rows per task,
    * and skewed mega-domains are exactly the rows the quota discards.
    *
    * `keyCol` need not be unique per group: rows sharing a key value get
    * a final tiebreak on a hash of ALL remaining columns, so the
    * surviving multiset is run- and partitioning-independent — rows that
    * still tie are identical in every column and therefore
    * interchangeable. (Map-typed columns are not hashable by Spark and
    * would need a serialized projection first.)
    */
  def groupQuota(
      df: DataFrame, keyCol: String, groupCol: String, quota: Int): DataFrame = {
    require(quota > 0, s"quota=$quota must be positive")
    val rest = df.columns.filterNot(_ == keyCol).sorted.map(col)
    val order = Seq(md5(col(keyCol).cast("string")).asc, col(keyCol).asc) ++
      (if (rest.isEmpty) Nil else Seq(xxhash64(struct(rest: _*)).asc))
    graft.operators.Browse.keepRanked(df, Seq(groupCol), quota, order: _*)
  }

  /** Deterministic global shuffle — the training-ORDER primitive: a
    * seed-keyed pseudo-random total order (`md5(seed || ':' || key)`,
    * key as final tiebreak) with a dense 0-based `shuffle_pos`. The
    * order is a pure function of (seed, key): stable across runs,
    * engines, partitionings and cluster sizes — re-running a data job
    * can never silently reshuffle a training curriculum — and changing
    * the seed is a fresh permutation. Epoch reshuffling = one seed per
    * epoch.
    *
    * Scale shape: one range-partitioned sort (Spark's standard total
    * sort — sampled range boundaries, no single-reducer funnel) plus a
    * two-level position assignment: per-partition counts (a
    * `partitionId`-keyed aggregate, one small row per partition) are
    * prefix-summed ON THE DRIVER and rejoined as offsets, the same
    * bounded-driver-traffic shape q106's sequence packing uses — NOT a
    * global window (a `row_number() OVER (ORDER BY …)` would move the
    * corpus through one task). Write the result `sortWithinPartitions`
    * into numbered shards and a trainer streams the permutation.
    */
  def deterministicShuffle(
      df: DataFrame, keyCol: String, seed: Long): DataFrame = {
    val h = md5(concat_ws(":", lit(seed.toString),
      col(keyCol).cast("string")))
    globalPositions(df.withColumn("__h", h),
      Seq(col("__h"), col(keyCol)), "shuffle_pos")
      .drop("__h")
  }

  /** Curriculum ordering — [[deterministicShuffle]] with a leading
    * STAGE key: global 0-based training positions where every row of
    * stage s precedes every row of stage s+1 (easy→hard curricula,
    * CCNet head-first schedules) and WITHIN a stage the order is the
    * seed-keyed pseudo-random shuffle. Same scale shape as the plain
    * shuffle: one range-partitioned sort on (stage, hash, key), the
    * two-level bounded-driver position assignment — never a global
    * window, and never a per-stage single partition (stages SPAN
    * range partitions; the curriculum is the sort order, not a
    * partitioning).
    */
  def curriculumOrder(df: DataFrame, keyCol: String, stageCol: String,
      seed: Long): DataFrame = {
    val h = md5(concat_ws(":", lit(seed.toString),
      col(keyCol).cast("string")))
    globalPositions(df.withColumn("__h", h),
      Seq(col(stageCol), col("__h"), col(keyCol)), "position")
      .drop("__h")
  }

  /** Dense 0-based global positions under `orderCols` — the shared
    * tail of [[deterministicShuffle]] and [[curriculumOrder]]: one
    * range-partitioned sort, per-partition counts prefix-summed on
    * the driver, offsets broadcast back, within-partition ranks from
    * a mapPartitions counter over the already-sorted layout.
    */
  private def globalPositions(df: DataFrame, orderCols: Seq[Column],
      posCol: String): DataFrame = {
    val sorted = df
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val withPid = sorted.withColumn("__pid", spark_partition_id())
    val cached = CacheRegistry.track(withPid.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = cached.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts)
      .map { case (off, (pid, _)) => (pid, off) }
    // offsets rejoin as a BROADCAST relation (one row per partition),
    // not a when-chain — at 10⁵ partitions a chain would be 10⁵
    // codegen branches per row. The within-partition rank comes from a
    // mapPartitions counter over the range-sorted cached layout — NOT
    // a window partitioned by __pid, which would hash-exchange and
    // re-sort the whole corpus a second time for an ordering the range
    // sort already established (if the cache evicts, the recompute
    // replays the same deterministic sort, so ranks never drift).
    val session = df.sparkSession
    import session.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val rankedSchema = cached.schema
      .add("__rank", org.apache.spark.sql.types.LongType, nullable = false)
    val ranked = session.createDataFrame(
      cached.rdd.mapPartitions { it =>
        var i = -1L
        it.map { r =>
          i += 1
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        }
      }, rankedSchema)
    ranked.join(offDf, "__pid")
      .withColumn(posCol, col("__rank") + col("__off"))
      .drop("__pid", "__off", "__rank")
  }

  /** Deterministic WEIGHTED sample without replacement — the
    * quality-weighted selection step of a data-curation pipeline
    * ("keep the best 10M documents, preferring high quality scores,
    * but randomly so the tail stays represented"): the
    * Efraimidis-Spirakis A-ES scheme with content hashes in place of
    * random draws. Each row with integer weight `w ≥ 1` gets the key
    * `min_{j=1..w} md5(seed:key:j)` — w independent hash draws, keep
    * the smallest — and the global sample is the `k` rows with the
    * smallest keys (key column as final tiebreak). A row's chance of
    * beating another rises with its weight exactly as in weighted
    * sampling without replacement, yet the selection is a pure
    * function of (seed, key, weight): reproducible across runs,
    * engines, partitionings — and oracle-checkable, which a
    * rand()-based sampler can never be. Returns the sampled rows with
    * a dense 1-based `rank` in key order.
    *
    * Scale shape: the min-of-w-hashes key is ONE per-row `array_min ∘
    * transform` projection (no explode — the w hash draws never
    * materialize as rows), then a single `TakeOrderedAndProject`
    * top-k: map-side + one bounded reduce, no shuffle of the corpus.
    * Weights must be integral values in `[1, maxWeight]` (default 10⁴):
    * anything else — null, zero, negative, fractional, or oversized —
    * fails fast with `raise_error` rather than silently shrinking the
    * candidate pool (a mis-typed weight column that truncated via
    * cast or dropped rows would distort the sample with no signal).
    * Rescale/quantize weights upstream; the scheme only needs their
    * RATIOS.
    *
    * MIGRATION (behavior break vs releases that silently filtered
    * `weight >= 1`): a corpus that legitimately carries zero/null
    * weight rows — "never sample this" markers — now aborts the whole
    * job at the first such row. Pre-filter them explicitly
    * (`df.filter(col(w) >= 1)`) before calling; the explicit filter
    * documents the exclusion the old behavior performed invisibly.
    */
  def weightedSample(
      df: DataFrame, keyCol: String, weightCol: String, k: Int,
      seed: Long, maxWeight: Int = 10000): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(maxWeight >= 1, s"maxWeight=$maxWeight must be positive")
    val raw = col(weightCol)
    val w = raw.cast("long")
    // integral check: a fractional weight survives cast("long") by
    // truncation, so compare the double views; null weights fail the
    // isNotNull arm and land in the same raise
    val ok = w.isNotNull && w >= 1 && w <= maxWeight &&
      raw.cast("double") === w.cast("double")
    val guarded = when(ok, w)
      .otherwise(raise_error(concat(
        lit(s"weightedSample: weight must be an integral value in " +
          s"[1, $maxWeight] but got "),
        coalesce(raw.cast("string"), lit("null")),
        lit(s" for $keyCol="), col(keyCol).cast("string"))).cast("long"))
    val top = df
      .withColumn("__wkey", array_min(transform(
        sequence(lit(1L), guarded),
        j => md5(concat_ws(":", lit(seed.toString),
          col(keyCol).cast("string"), j.cast("string"))))))
      .orderBy(col("__wkey"), col(keyCol))
      .limit(k)
    top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__wkey"), col(keyCol))).cast("long"))
      .drop("__wkey")
  }

  /** UniMax language sampling (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a total document `budget` UNIFORMLY
    * across groups (languages), capped by what each group actually
    * has — the closed-form waterfill. Head languages get the fair
    * share, tail languages contribute everything they have, and the
    * mass a tail language cannot absorb redistributes among the rest
    * (temperature sampling's α-power compromise, q140, replaced by a
    * hard uniform-up-to-cap rule).
    *
    * Exact allocation, all relational (groups sorted by (count, name);
    * running prefix sums locate the waterfill pivot — the first group
    * whose count exceeds `⌊remaining/groupsLeft⌋`; groups before it
    * take everything, groups from it on take the floor share, and the
    * integer remainder goes +1 apiece to the first capped groups in
    * sort order). Within each group the kept documents are the
    * `alloc` smallest `(md5(id), id)` — the deterministic
    * content-hash "random" sample every split here uses. Returns the
    * kept rows plus `alloc` (the group's allocation).
    *
    * Scale shape: the allocation math runs on the per-GROUP count
    * relation (dozens of rows — two window passes over it); the
    * corpus-side work is one rank-within-group window (one shuffle on
    * the group key) and the rank ≤ alloc filter.
    */
  def unimaxSample(df: DataFrame, idCol: String, groupCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget=$budget must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
    val byC = Window.orderBy(col("__c"), col(groupCol))
    val ord = counts
      .withColumn("__i", row_number().over(byC).cast("long"))
      .withColumn("__L", count(lit(1)).over(
        Window.partitionBy()).cast("long"))
      .withColumn("__pre", sum(col("__c")).over(
        byC.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // fair share if the waterfill stopped at this row; exact-integer
    // doubles (< 2^53), so floor is cross-engine identical
    val t = floor((lit(budget) - (col("__pre") - col("__c"))).cast("double")
      / (col("__L") - col("__i") + lit(1L)).cast("double")).cast("long")
    val cand = ord.withColumn("__t", t)
    val pivot = cand.filter(col("__c") > col("__t"))
      .agg(min(struct(col("__i").as("pi"), col("__t").as("pt"),
        (col("__pre") - col("__c")).as("prepiv"), col("__L").as("l")))
        .as("__p"))
    val alloc = cand.crossJoin(broadcast(pivot))
      .withColumn("__rem",
        (lit(budget) - col("__p.prepiv")) -
          col("__p.pt") * (col("__p.l") - col("__p.pi") + lit(1L)))
      .withColumn("alloc",
        when(col("__p").isNull || col("__i") < col("__p.pi"), col("__c"))
          .otherwise(col("__p.pt") +
            when(col("__i") - col("__p.pi") < col("__rem"), lit(1L))
              .otherwise(lit(0L))))
      .select(col(groupCol), col("alloc"))
    val rank = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__r", row_number().over(rank).cast("long"))
      .join(broadcast(alloc), Seq(groupCol))
      .filter(col("__r") <= col("alloc"))
      .drop("__r")
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    * score every document's mean bigram log-prob under a TARGET-domain
    * reference LM and under the RAW-corpus LM (both the proven
    * [[TextAnalysis.bigramLogProbUnder]] surface, hashed-n-gram spirit
    * with exact bigrams), take the log importance ratio
    * `weight = avgLp_target − avgLp_raw`, and select `n` documents
    * WITHOUT replacement with probability ∝ exp(weight) via
    * Gumbel-top-k: key = weight + g, g = −ln(−ln(u)) with u the
    * deterministic 48-bit md5 uniform `(h + 0.5)/16¹²` — hash-derived
    * noise in place of RNG (the [[weightedSample]] convention), so the
    * "resample" is a pure function of the corpus: reproducible across
    * runs, engines, partitionings, and oracle-checkable.
    *
    * The Gumbel draw is rounded to 6 decimals BEFORE the add (the
    * cross-engine float rule — the rounded grid absorbs last-ulp libm
    * `ln` differences); final-key ties break on the smaller id.
    * Returns the selected rows: (rank, id, n_bigrams, weight,
    * gumbel_key), rank 1 = best.
    *
    * Scale shape: two reference-model scorings (bigram explode + two
    * count aggregations + broadcast-vocab join each — the
    * bigramLogProbUnder plan), one id-keyed join, then a single
    * `TakeOrderedAndProject` top-n on the key: no global sort, no
    * single-partition window, nothing corpus-sized on the driver.
    * Documents with fewer than 2 tokens carry no bigram evidence and
    * are outside the scored domain (the bigramLogProbUnder contract).
    */
  def dsirSelect(target: DataFrame, raw: DataFrame, df: DataFrame,
      idCol: String, textCol: String, n: Int,
      alpha: Double = 0.4): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    // the score corpus's bigram explode runs ONCE and feeds both model
    // scorings — at corpus scale the explode is the dominant scan, and
    // scoring under k reference models must cost k join tails, not k
    // full passes
    val bigrams = CacheRegistry.track(
      TextAnalysis.docBigrams(df, idCol, textCol).persist())
    val (tcu, tcb, tv) = TextAnalysis.bigramModelStats(target, textCol)
    val (rcu, rcb, rv) = TextAnalysis.bigramModelStats(raw, textCol)
    val st = TextAnalysis.scoreUnderBigrams(tcu, tcb, tv, bigrams, idCol, alpha)
      .select(col(idCol), col("n_bigrams"), col("avg_logprob").as("__t"))
    val sr = TextAnalysis.scoreUnderBigrams(rcu, rcb, rv, bigrams, idCol, alpha)
      .select(col(idCol), col("avg_logprob").as("__r"))
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(281474976710656.0)
    val g = round(-log(-log(u)), 6)
    val keyed = st.join(sr, Seq(idCol))
      .withColumn("weight", col("__t") - col("__r"))
      .withColumn("gumbel_key", col("weight") + g)
    val top = keyed.orderBy(col("gumbel_key").desc, col(idCol)).limit(n)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("gumbel_key").desc, col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col("n_bigrams"), col("weight"),
        round(col("gumbel_key"), 6).as("gumbel_key"))
  }
}
