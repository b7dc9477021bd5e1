package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the tokenizer-training step of an LLM data pipeline.
  *
  * Scale shape: the corpus is touched ONCE, by a single tokenize +
  * word-count shuffle; every scan after that runs on the distinct-word
  * table. Two formulations share one loop, dispatched on measured
  * vocabulary size ([[RescanVocabConf]]):
  *
  *  - '''full rescan''' (small V — the default dispatch bound of 10⁶
  *    sits conservatively below the ~10⁷ measured crossover; see the
  *    BpeStress table in PERFORMANCE.md and [[RescanVocabConf]]):
  *    recompute all pair counts from the vocabulary each scan. At
  *    small V the one explode+agg is cheaper than maintaining count
  *    state.
  *  - '''incremental''' (large V, subword-nmt's queue-update
  *    formulation): a loop-carried pair-count relation, maintained by
  *    deltas from the affected words only — after choosing pair (a,b),
  *    only words whose symbol string contains the `a b` boundary are
  *    re-exploded, their old pairs subtracted and new pairs added via a
  *    full-outer join co-partitioned on (a,b).
  *
  * Both formulations REWRITE the loop state (the vocabulary; for the
  * incremental path also the counts relation) once per scan, so the
  * per-scan cost has an O(V) floor no delta trick removes. The lever
  * that beats that floor is '''merge batching''': each scan collects
  * the top-M candidate pairs (one bounded driver round-trip,
  * [[BatchTopMConf]]) and applies every pair of a provably
  * sequential-equivalent prefix ([[selectBatch]]) in ONE conditional
  * rewrite with ONE combined count delta — K merges per state rewrite,
  * so a 32k-merge tokenizer costs ~32k/K corpus-state rewrites instead
  * of 32k. Batching preserves the exact sequential rule sequence (the
  * oracle replays rules one at a time): see [[selectBatch]] for the
  * admission proof sketch. Measured per-merge amortized costs for all
  * three formulations (sequential rescan / sequential incremental /
  * batched) are recorded in PERFORMANCE.md, produced by
  * [[graft.BpeStress]].
  *
  * Determinism: the candidate order is (count DESC, left ASC, right
  * ASC) via `TakeOrderedAndProject` (partial per-partition top-M, no
  * global sort). Merge application is leftmost non-overlapping (the
  * reference greedy semantics), implemented by doubling the symbol
  * separators so adjacent occurrences cannot steal each other's
  * boundary space (`" a  b "` consumes one space per side, leaving one
  * for the next match); the replacement `" ab "` gives one space back
  * per side, restoring the doubled invariant, so any rule sequence
  * chains exactly inside one doubled form ([[applyMerges]]).
  *
  * Words are held as canonical single-space symbol strings
  * (`"s p a r k </w>"`) rather than arrays so every step stays in
  * codegen'd string expressions (the interpreted-HOF cost note on
  * [[Dedup.prefixJaccardPairs]]). Symbols never contain spaces — the
  * pre-tokenizer admits only all-letter words — which makes both the
  * literal-replace application and the ` a b ` containment probe exact.
  */
object Bpe {

  /** Session conf key: scans collect this many top candidate pairs and
    * batch the sequential-equivalent prefix (default 64). `1` degrades
    * to the exact sequential loop.
    */
  val BatchTopMConf = "spark.graft.bpe.batchTopM"

  /** Session conf key: at or below this many distinct words the learner
    * uses the full-rescan formulation; above it, the incremental one.
    * The default 1,000,000 is a CONSERVATIVE threshold below the
    * measured crossover: the BpeStress table in PERFORMANCE.md places
    * incremental-vs-rescan parity at ~10⁷ distinct words (at V=10⁶
    * rescan is still the faster formulation on both fixtures), so the
    * default only switches once the rescan cost is clearly growing,
    * at the price of picking the slower formulation inside the
    * 10⁶–10⁷ band. Both formulations are spec-pinned identical; raise
    * the conf toward 10⁷ when per-scan latency in that band matters.
    */
  val RescanVocabConf = "spark.graft.bpe.rescanMaxVocab"

  /** Session conf key: the pre-tokenizer that splits text into the
    * word units BPE learns over — `whitespace` (default: split on
    * single spaces, admit only all-letter words ≤ `maxWordLen`; the
    * subword-nmt-style contract every existing catalog query pins) or
    * `bytelevel` (GPT-2-style, Radford et al. 2019: letter runs,
    * digit runs, and punctuation runs are each their own learnable
    * token, with a LEADING-SPACE convention — a token that followed a
    * space carries it, rewritten to the `Ġ` marker U+0120 so symbols
    * still never contain spaces and the separator-doubling merge
    * application stays exact. Punctuation and digits stop routing to
    * the OOV page and become learnable vocabulary). Read at TRAINING
    * time by [[learnMerges]]; the learned [[Model]] CARRIES its mode
    * (persisted by [[saveModel]], restored by [[loadModel]] —
    * pre-column saves default to whitespace, the only mode that
    * existed), and every consumer — [[applyModel]] / [[encodeIds]] /
    * [[encodeCounts]] / [[decodeIds]] — follows the MODEL, not this
    * conf. A train/apply mode mismatch (which would silently tokenize
    * garbage) is therefore impossible by construction; this conf only
    * matters on the job that trains.
    *
    * Byte-level honest limits: only the SPACE character carries the
    * leading-space convention — other whitespace (tabs, newlines)
    * separates tokens but does not round-trip, and a literal `Ġ` in
    * the input decodes as a space (the same ambiguity GPT-2 accepts).
    * Runs of k ≥ 2 spaces keep one space on the following token and
    * drop the rest (no lookahead — deliberately regular so the DuckDB
    * oracle's RE2 replays the split identically).
    */
  val PretokenizerConf = "spark.graft.bpe.pretokenizer"

  /** GPT-2's leading-space marker (U+0120 `Ġ`). */
  private[operators] val SpaceMarker = "Ġ"

  /** The byte-level split: optional-leading-space letter / digit /
    * punctuation runs. Leftmost-first alternation, no lookahead —
    * identical under java.util.regex (Spark) and RE2 (DuckDB).
    */
  private[operators] val BytelevelPattern =
    " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  private def pretokMode(spark: SparkSession): String =
    spark.conf.getOption(PretokenizerConf).getOrElse("whitespace") match {
      case m @ ("whitespace" | "bytelevel") => m
      case other => throw new IllegalArgumentException(
        s"$PretokenizerConf=$other (expected whitespace|bytelevel)")
    }

  /** The raw token array of a text column under `mode` (bytelevel
    * tokens still carry their leading space — rewrite AFTER the
    * explode via [[markSpace]], a codegen'd string function, so no
    * interpreted HOF runs over the corpus).
    */
  private def rawTokens(textCol: Column, mode: String): Column =
    if (mode == "whitespace") split(textCol, " ")
    else regexp_extract_all(textCol, lit(BytelevelPattern), lit(0))

  /** Leading-space → `Ġ` rewrite (identity in whitespace mode). */
  private def markSpace(w: Column, mode: String): Column =
    if (mode == "whitespace") w
    else regexp_replace(w, "^ ", SpaceMarker)

  /** The pre-tokenizer admission predicate: which exploded tokens may
    * enter the vocabulary / replay loop. Whitespace mode admits only
    * all-letter words; bytelevel admits every non-empty run (that is
    * the point — punctuation and digits become learnable), bounded by
    * the same `maxWordLen`.
    */
  private def pretokAdmit(w: Column, mode: String, maxWordLen: Int): Column =
    if (mode == "whitespace")
      w.rlike("^\\p{L}+$") && length(w) <= maxWordLen
    else w =!= "" && length(w) <= maxWordLen

  /** Session conf key: how [[applyModel]] treats out-of-vocabulary
    * words — `drop` (default: pre-tokenizer-rejected and
    * out-of-alphabet words vanish from the output, the learn-step
    * contract), `unk` (each such word emits the single reserved
    * [[unkId]] token, so token counts faithfully cover every word of
    * every document — what a production tokenizer does), or `bytes`
    * (each such word emits its UTF-8 byte sequence shifted onto the
    * reserved page `[unkId, unkId+256)` — GPT-2-style byte fallback:
    * no text is ever dropped OR collapsed, every document round-trips
    * to a faithful id sequence regardless of script).
    */
  val OovModeConf = "spark.graft.bpe.oov"

  /** One learned merge rule: at `rank` (1-based), `left`+`right` had the
    * highest weighted adjacent-pair count `pairCount` and were fused into
    * `merged`.
    */
  final case class MergeRule(
      rank: Int, left: String, right: String, merged: String,
      pairCount: Long)

  /** A learned model: the driver-side rule list (bounded: `numMerges`
    * rows) plus the final word→symbols vocabulary relation
    * (`w`, `cnt`, `sym`), materialized as a [[Lineage.cut]] leaf and
    * [[CacheRegistry]]-tracked (finish downstream actions before drain).
    */
  final case class Model(merges: Seq[MergeRule], vocab: DataFrame,
      pretokenizer: String = "whitespace") {
    /** Memoized symbol→id assignment (driver-side, bounded:
      * |alphabet| + numMerges rows, ordered by id): the alphabet
      * derivation job runs ONCE per model instance, lazily, and every
      * consumer — [[Bpe.symbolTable]], [[Bpe.unkId]],
      * [[Bpe.applyModel]], [[Bpe.decodeIds]] — reuses it. Before the
      * memo, applyModel in unk/bytes mode re-ran the derivation twice
      * per CALL and a streaming pipeline paid it every micro-batch for
      * an immutable model.
      */
    lazy val symbolRows: Seq[(String, Int)] = Bpe.deriveSymbolRows(this)
  }

  /** Initial symbolization: every character becomes a symbol, plus the
    * `</w>` end-of-word marker (`"spark"` → `"s p a r k </w>"`).
    */
  private def symbolize(w: Column) =
    concat(regexp_replace(w, "(.)", "$1 "), lit("</w>"))

  /** The corpus-touched-once word-count relation `(w, cnt, sym)`. Only
    * all-letter words (`^\p{L}+$` — any Unicode letter, so diacritic
    * words are in-vocabulary) with length ≤ `maxWordLen` enter; symbols
    * then never contain spaces or separators, which keeps the
    * literal-replace application exact. Other tokens are
    * out-of-vocabulary by contract, the standard pre-tokenizer split.
    */
  private def initialVocab(
      df: DataFrame, textCol: String, maxWordLen: Int): DataFrame = {
    val mode = pretokMode(df.sparkSession)
    df.select(explode(rawTokens(col(textCol), mode)).as("w0"))
      .select(markSpace(col("w0"), mode).as("w"))
      .filter(pretokAdmit(col("w"), mode, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("sym", symbolize(col("w")))
  }

  /** Weighted adjacent-pair counts `(a, b, pc)` of a `(cnt, sym)`
    * relation — posexplode keeping the array column, pair partner via
    * `arr[pos+1]` (GetArrayItem, codegen; bounds-safe under ANSI because
    * of the pos filter). All map-side: the only shuffle is the (a,b)
    * agg — a lead() window here would add a per-word shuffle+sort of
    * the exploded symbol table for no semantic gain. Negative `cnt`
    * rows are the subtraction half of a delta (see the incremental
    * branch of [[learnLoop]]).
    */
  private def pairCounts(rel: DataFrame): DataFrame = {
    val syms = rel.select(col("cnt"), split(col("sym"), " ").as("syms"))
    syms
      .select(col("cnt"), col("syms"), posexplode(col("syms")))
      .filter(col("pos") < size(col("syms")) - 1)
      .select(col("cnt"), col("col").as("a"),
        col("syms")(col("pos") + 1).as("b"))
      .groupBy("a", "b")
      .agg(sum(col("cnt")).as("pc"))
  }

  /** Top-`m` candidate pairs by (count DESC, left ASC, right ASC) — a
    * `TakeOrderedAndProject` (per-partition partial top-m, merged on the
    * driver), so the round-trip is bounded by `m` small rows at any
    * corpus scale.
    */
  private def topPairs(
      counts: DataFrame, m: Int): Seq[(Long, String, String)] =
    counts.orderBy(col("pc").desc, col("a"), col("b")).limit(m)
      .collect().toSeq
      .map(r => (r.getLong(2), r.getString(0), r.getString(1)))

  /** The sequential-equivalent batch: from `rows` (candidate pairs in
    * exact tiebreak order; `truncated` = the collection was cut at M, so
    * unseen pairs with count ≤ `rows.last` count exist), pick a prefix
    * of merges that the one-at-a-time sequential learner would provably
    * choose in the same order. `knownMerged` is every merged string
    * created by PREVIOUS iterations — the only multi-character symbols
    * that can exist in the vocabulary besides `</w>` (the initial
    * alphabet is single characters, and two non-empty symbols cannot
    * concatenate to `</w>`).
    *
    * Applying one merge (a,b)→m changes EXACTLY these pair counts:
    * pairs with right = a (an `x a b` site turns `(x,a)` into `(x,m)`),
    * pairs with left = b (`a b y` turns `(b,y)` into `(m,y)`), the pair
    * (a,b) itself (→ 0), and the created pairs involving m. Pairs
    * merely SHARING a's left symbol or b's right symbol are untouched —
    * `(a,c)` and `(b,c)` style families coexist — which is what lets
    * same-left and same-right families batch (the early `(x, </w>)`
    * merges of any corpus are exactly such a family).
    *
    * Admission rules, scanning in order (L/R/M = accepted lefts /
    * rights / merged strings):
    *  1. accept (c,d)→m iff c ∉ R ∪ M, d ∉ L ∪ M, and m ∉ M — i.e. no
    *     applied batch-mate changes this pair's count or sites, and no
    *     two batch-mates fuse to the same string (e.g. (a,bc) vs (ab,c)
    *     both making `abc`);
    *  2. a pair whose merged string is ALREADY a vocabulary symbol
    *     (`knownMerged`) is a conflict: post-merge, the pre-existing
    *     pairs of that symbol and the merge-created ones conflate, so a
    *     candidate like (x, m) could reach oldCount + createdCount —
    *     up to 2T — and upset a kept pair the T bound cleared. Accepted
    *     only as the FIRST candidate, ending the scan (a singleton batch
    *     is literally the sequential step, where conflation is the
    *     defined string semantics);
    *  3. a self-pair (x,x) ends the scan: its sites self-overlap and
    *     its application creates pairs like (xx,x) whose counts derive
    *     from the pair ITSELF, which the conflict bound below cannot
    *     cover (accepted alone if first);
    *  4. every skipped or unseen count is folded into a blocker bound
    *     `T` (max conflicting count seen, the scan-stop count, and the
    *     truncation floor), and only accepted pairs with count
    *     STRICTLY above `T` are kept.
    *
    * Why that is sequential-exact: applying accepted merges p₁..pᵢ₋₁
    * leaves pᵢ's count unchanged (rule 1: pᵢ.left is no earlier
    * right/merged, pᵢ.right no earlier left/merged). Every OTHER
    * candidate at sequential step i is an old pair whose count never
    * increased and that either appeared in `rows` (if it survives to
    * step i un-chosen it was skipped or is below the kept prefix — in
    * the bound either way) or sat under the truncation floor; or a
    * merge-created pair (x,mⱼ)/(mⱼ,y)/(mᵢ,mⱼ) whose count is bounded
    * by the pre-count of its source pair — (x,aⱼ), (bⱼ,y), (bᵢ,aⱼ)
    * respectively, each of which has a right in L or a left in R, so
    * it was blocked if scanned and under the floor if not (rule 2
    * guarantees no pre-existing count conflates on top) — all ≤ T <
    * count(pᵢ), strictness killing tiebreak upsets — so the step-i
    * argmax is exactly pᵢ. Falls back to the plain argmax singleton
    * (always exact) when the guard empties the prefix.
    */
  private[graft] def selectBatch(
      rows: Seq[(Long, String, String)], truncated: Boolean,
      maxRules: Int,
      knownMerged: String => Boolean = _ => false)
      : Seq[(Long, String, String)] = {
    if (rows.isEmpty) return Nil
    val accepted =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val lefts = scala.collection.mutable.HashSet.empty[String]
    val rights = scala.collection.mutable.HashSet.empty[String]
    val mergeds = scala.collection.mutable.HashSet.empty[String]
    var blocker = -1L
    var stopped = false
    val it = rows.iterator
    while (it.hasNext && !stopped) {
      val r = it.next()
      val (c, a, b) = r
      if (accepted.size >= maxRules) {
        blocker = math.max(blocker, c); stopped = true
      } else if (a == b || knownMerged(a + b)) {
        if (accepted.isEmpty) { accepted += r; stopped = true }
        else { blocker = math.max(blocker, c); stopped = a == b }
      } else {
        val m = a + b
        val conflict = rights.contains(a) || mergeds.contains(a) ||
          lefts.contains(b) || mergeds.contains(b) || mergeds.contains(m)
        if (conflict) blocker = math.max(blocker, c)
        else { accepted += r; lefts += a; rights += b; mergeds += m }
      }
    }
    val floor = if (truncated) rows.last._1 else -1L
    val t = math.max(blocker, floor)
    val kept = accepted.takeWhile(_._1 > t)
    (if (kept.isEmpty) accepted.take(1) else kept).toSeq
  }

  /** True iff the canonical symbol string contains symbol `a` directly
    * followed by symbol `b` (padding both sides makes word-edge
    * occurrences visible; symbols are space-free, so the probe cannot
    * false-positive on symbol substrings like `ab`).
    */
  private def containsPair(a: String, b: String): Column =
    instr(concat(lit(" "), col("sym"), lit(" ")), lit(s" $a $b ")) > 0

  /** Leftmost non-overlapping application of `rules` in order, as one
    * expression over `sym`: double the separators once (so `" a  b "`
    * owns one boundary space per side and adjacent occurrences cannot
    * overlap), chain one literal replace per rule, then re-canonize back
    * to single spaces once.
    *
    * Chaining exactness for an ARBITRARY rule sequence (not just a
    * disjoint batch): the pattern `" a  b "` consumes one space from
    * each flanking separator and the replacement `" ab "` gives one
    * back per side, so every replacement RESTORES the doubled invariant
    * (`" x  a  b  y "` → `" x  ab  y "`) — each rule in the chain sees
    * a well-formed doubled string, and the chain IS sequential
    * one-pass-per-rule application. This is what lets [[applyModel]]
    * replay dependent saved rules in 64-rule chunks.
    */
  private def applyMerges(sym: Column, rules: Seq[(String, String)]): Column = {
    val doubled = concat(lit(" "),
      call_function("replace", sym, lit(" "), lit("  ")),
      lit(" "))
    val replaced = rules.foldLeft(doubled) { case (s, (a, b)) =>
      call_function("replace", s, lit(s" $a  $b "), lit(s" ${a + b} "))
    }
    trim(regexp_replace(replaced, " +", " "))
  }

  /** Learn `numMerges` merge rules from whitespace-tokenized `textCol`,
    * dispatching on measured vocabulary size (module doc): full rescan
    * at small V, incremental pair-count maintenance at large V, merge
    * batching in both. The driver sees ≤ M bounded rows per scan.
    */
  def learnMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWordLen: Int = 32): Model =
    learnMergesTimed(df, textCol, numMerges, maxWordLen, null)

  /** [[learnMerges]] with a per-merge timing hook (rank, seconds —
    * batched scans report the scan time amortized over the batch, the
    * comparable per-merge cost) and an optional per-scan hook (batch
    * width — the exact state-rewrite count, no dt-equality inference) —
    * how [[graft.BpeStress]] produces the PERFORMANCE.md formulation
    * table.
    */
  private[graft] def learnMergesTimed(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWordLen: Int, onIter: (Int, Double) => Unit,
      onScan: Int => Unit = null): Model = {
    require(numMerges > 0, s"numMerges=$numMerges must be positive")
    require(maxWordLen > 0, s"maxWordLen=$maxWordLen must be positive")
    val conf = df.sparkSession.conf
    val topM = math.max(1,
      conf.getOption(BatchTopMConf).map(_.toInt).getOrElse(64))
    val rescanMax = conf.getOption(RescanVocabConf).map(_.toLong)
      .getOrElse(1000000L)
    val words = Lineage.cut(initialVocab(df, textCol, maxWordLen))
    learnLoop(words, numMerges, topM,
      incremental = words.count() > rescanMax, onIter, onScan,
      pretokMode(df.sparkSession))
  }

  /** Formulation-forced entry (tests and [[graft.BpeStress]]): explicit
    * batch width and formulation, bypassing the size dispatch.
    */
  private[graft] def learnMergesWith(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWordLen: Int = 32, topM: Int = 64, incremental: Boolean = true,
      onIter: (Int, Double) => Unit = null): Model = {
    require(numMerges > 0, s"numMerges=$numMerges must be positive")
    require(maxWordLen > 0, s"maxWordLen=$maxWordLen must be positive")
    learnLoop(Lineage.cut(initialVocab(df, textCol, maxWordLen)),
      numMerges, math.max(1, topM), incremental, onIter, null,
      pretokMode(df.sparkSession))
  }

  /** The shared scan loop. Loop-carried state, [[Lineage.cut]] each
    * scan so every plan is a constant-size leaf: the vocabulary
    * `(w, cnt, sym)` and — incremental formulation only — the pair-count
    * relation `(a, b, pc)`. Each scan runs the bounded top-M collect,
    * applies the [[selectBatch]] prefix in one conditional rewrite, and
    * (incremental) folds ONE combined delta from the affected words into
    * the counts. Stops early if no adjacent pair is left.
    */
  private def learnLoop(
      words0: DataFrame, numMerges: Int, topM: Int, incremental: Boolean,
      onIter: (Int, Double) => Unit, onScan: Int => Unit = null,
      pretokenizer: String = "whitespace"): Model = {
    var words = words0
    var counts: DataFrame =
      if (incremental)
        Lineage.cut(pairCounts(words.select(col("cnt"), col("sym")))
          .repartition(col("a"), col("b")))
      else null
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    val mergedSyms = scala.collection.mutable.HashSet.empty[String]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val t0 = System.nanoTime()
      val cur =
        if (incremental) counts
        else pairCounts(words.select(col("cnt"), col("sym")))
      val top = topPairs(cur, topM)
      if (top.isEmpty) exhausted = true
      else {
        val batch =
          selectBatch(top, top.length == topM, numMerges - k, mergedSyms)
        batch.zipWithIndex.foreach { case ((pc, a, b), i) =>
          rules += MergeRule(k + i + 1, a, b, a + b, pc)
          mergedSyms += (a + b)
        }
        val touched = batch.map { case (_, a, b) => containsPair(a, b) }
          .reduce(_ || _)
        val newSym =
          applyMerges(col("sym"), batch.map { case (_, a, b) => (a, b) })
        if (incremental) {
          // pair-count delta from the affected words ONLY: subtract
          // their old pairs, add their new ones. Words without any
          // batch boundary keep their symbols, hence their pairs.
          val affected = words.filter(touched)
          val delta = pairCounts(
            affected.select(negate(col("cnt")).as("cnt"), col("sym"))
              .union(affected.select(col("cnt"), newSym.as("sym"))))
            .filter(col("pc") =!= 0)
            .withColumnRenamed("pc", "d")
          val prevC = counts
          counts = Lineage.cut(
            counts.join(delta, Seq("a", "b"), "full_outer")
              .select(col("a"), col("b"),
                (coalesce(col("pc"), lit(0L)) +
                  coalesce(col("d"), lit(0L))).as("pc"))
              .filter(col("pc") > 0))
          Lineage.release(prevC) // dead once the new cut is real
        }
        val prevW = words
        words = Lineage.cut(words.withColumn("sym",
          when(touched, newSym).otherwise(col("sym"))))
        Lineage.release(prevW)
        val dt = (System.nanoTime() - t0) / 1e9 / batch.length
        if (onIter != null)
          (k + 1 to k + batch.length).foreach(r => onIter(r, dt))
        if (onScan != null) onScan(batch.length)
        k += batch.length
      }
    }
    if (counts != null) Lineage.release(counts) // terminal count state is dead
    Model(rules.toSeq, words, pretokenizer)
  }

  /** The naive reference formulation — recompute ALL pair counts from
    * the full vocabulary and take ONE merge per scan. Kept (test-visible
    * only) as the equality reference: every production path —
    * incremental, batched, dispatched — must choose identical rules and
    * produce an identical vocabulary at every depth, and
    * [[graft.BpeStress]] measures the per-merge cost of each
    * formulation against it (table in PERFORMANCE.md).
    */
  private[graft] def learnMergesFullRescan(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWordLen: Int = 32, onIter: (Int, Double) => Unit = null): Model = {
    require(numMerges > 0, s"numMerges=$numMerges must be positive")
    require(maxWordLen > 0, s"maxWordLen=$maxWordLen must be positive")
    var words = Lineage.cut(initialVocab(df, textCol, maxWordLen))
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val t0 = System.nanoTime()
      topPairs(pairCounts(words.select(col("cnt"), col("sym"))), 1) match {
        case Seq() => exhausted = true
        case Seq((pc, a, b)) =>
          rules += MergeRule(k + 1, a, b, a + b, pc)
          val prev = words
          words = Lineage.cut(words.withColumn("sym",
            when(containsPair(a, b), applyMerges(col("sym"), Seq((a, b))))
              .otherwise(col("sym"))))
          Lineage.release(prev)
          k += 1
          if (onIter != null) onIter(k, (System.nanoTime() - t0) / 1e9)
      }
    }
    Model(rules.toSeq, words, pretokMode(df.sparkSession))
  }

  /** The model at merge depth `k` — the vocabulary-size ablation tool
    * a tokenizer team actually wants: train ONCE at full depth, then
    * serve any smaller vocabulary without retraining. EXACTLY equal to
    * `learnMerges(corpus, k)` by construction: merge selection is
    * sequential (rule k+1 never influences rules 1..k — the batched
    * learner is spec-pinned sequential-equivalent), so the first `k`
    * rules ARE the depth-k training, and the depth-k vocabulary is the
    * initial symbolization with those rules replayed (a
    * vocabulary-sized job — `model.vocab`'s word list re-symbolized,
    * no corpus pass; counts carry over unchanged). The equality is
    * spec-pinned, rules AND vocabulary AND encode output.
    */
  def truncate(model: Model, k: Int, rulesPerChunk: Int = 64): Model = {
    require(k >= 0 && k <= model.merges.length,
      s"k=$k must be in [0, ${model.merges.length}]")
    require(rulesPerChunk > 0, s"rulesPerChunk=$rulesPerChunk must be positive")
    val rules = model.merges.filter(_.rank <= k).sortBy(_.rank)
    var words = Lineage.cut(model.vocab
      .select(col("w"), col("cnt"))
      .withColumn("sym", symbolize(col("w"))))
    rules.grouped(rulesPerChunk).foreach { chunk =>
      val prev = words
      words = Lineage.cut(words.withColumn("sym",
        applyMerges(col("sym"), chunk.map(r => (r.left, r.right)))))
      Lineage.release(prev)
    }
    Model(rules, words, model.pretokenizer)
  }

  /** The learned rules as a DataFrame (for the catalog / persistence):
    * `(merge_rank, lhs, rhs, merged, pair_count)`.
    */
  def mergesDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges
      .map(r => (r.rank.toLong, r.left, r.right, r.merged, r.pairCount))
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Persist a learned model: `<dir>/merges` (bounded — `numMerges`
    * rows) and `<dir>/vocab` (the corpus-sized `(w, cnt, sym)`
    * relation) as parquet. The pair with [[loadModel]] is the tokenizer
    * lifecycle a real pipeline runs: train ONCE, then any later job —
    * another session, another cluster — loads the model and calls
    * [[applyModel]] on corpora the trainer never saw (or [[encodeIds]]
    * / [[encodeCounts]] on the training corpus itself).
    *
    * `<dir>/meta` records the persisted-format version. Version 2 is
    * the current format: the oov=bytes reserved page starts at
    * `unkId + 1` (the `unkId + b` base of the unreleased predecessor
    * collided byte 0 with UNK itself, so id streams written under one
    * base decode shifted-by-one under the other — the marker exists
    * precisely so that mismatch is a loud load-time error, never a
    * silent mis-decode). [[loadModel]] refuses any other version; a
    * directory with no `meta` (written before the marker existed) is
    * accepted as version 2, the only format ever released.
    */
  val FormatVersion = 2

  def saveModel(model: Model, dir: String): Unit = {
    val spark = model.vocab.sparkSession
    import spark.implicits._
    mergesDf(spark, model).repartition(1)
      .write.mode("overwrite").parquet(s"$dir/merges")
    model.vocab.select("w", "cnt", "sym")
      .write.mode("overwrite").parquet(s"$dir/vocab")
    Seq((FormatVersion.toLong, "unk_id+1", model.pretokenizer))
      .toDF("format_version", "oov_page_base", "pretokenizer")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a [[saveModel]] directory back into a [[Model]]. The merge
    * list is a bounded driver-side collect (`numMerges` rows by
    * construction — the same boundedness [[learnMerges]]' own rule
    * buffer has); the vocabulary stays a lazy parquet relation, so
    * loading costs no corpus-sized action.
    */
  def loadModel(spark: SparkSession, dir: String): Model = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var pretok = "whitespace"
    if (fs.exists(metaPath)) {
      // headOption, not head(): a meta directory that exists but holds
      // no rows (partial copy, interrupted write) must raise the same
      // descriptive format error, not a bare NoSuchElementException
      val meta = spark.read.parquet(s"$dir/meta")
      val row = meta.limit(1).collect().headOption
        .getOrElse(throw new IllegalArgumentException(
          s"loadModel: $dir/meta exists but holds no readable " +
            "format_version row (interrupted or partial save?); " +
            "re-save the model with this release's saveModel"))
      val v = row.getLong(row.fieldIndex("format_version"))
      require(v == FormatVersion,
        s"loadModel: $dir was saved with persisted-format version $v; " +
          s"this release reads version $FormatVersion (the oov=bytes " +
          "reserved page moved from unkId+b to unkId+1+b between " +
          "versions — decoding across the boundary would shift every " +
          "byte-fallback id by one). Re-save the model with this " +
          "release's saveModel.")
      // models saved before the pretokenizer column existed are
      // whitespace by construction (the only mode that existed)
      if (meta.columns.contains("pretokenizer"))
        pretok = row.getString(row.fieldIndex("pretokenizer"))
    }
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy("merge_rank").collect().toSeq
      .map(r => MergeRule(r.getLong(0).toInt, r.getString(1),
        r.getString(2), r.getString(3), r.getLong(4)))
    Model(merges, spark.read.parquet(s"$dir/vocab"), pretok)
  }

  /** Deterministic symbol→id table for a learned model, as a (tiny)
    * DataFrame `(sym, id)` — ids are dense ints: the base alphabet
    * (every initial symbol = distinct word characters plus `</w>`)
    * sorted lexicographically takes 0..|Σ|-1, then merged symbols in
    * merge-rank order. A merged string that collides with an earlier
    * symbol (two merge paths CAN fuse to the same string — e.g. (a,bc)
    * after (ab,c)) keeps its FIRST assignment, so the map is a
    * function. The table is bounded (|alphabet| + numMerges rows), so
    * the unpartitioned row_number window and the downstream broadcast
    * join are both safe at any corpus scale. Backed by the
    * [[Model.symbolRows]] memo: the derivation job runs once per model
    * instance; this call just wraps the memoized rows as a local
    * relation (no corpus job).
    */
  def symbolTable(model: Model): DataFrame = {
    val spark = model.vocab.sparkSession
    import spark.implicits._
    model.symbolRows.toDF("sym", "id")
  }

  /** Test-visible count of [[deriveSymbolRows]] executions — the memo
    * contract ("one derivation job per model, ever") is pinned by
    * specs (BpeSpec's listener test, CorpusStreamSpec's two-drain
    * test) against this counter.
    */
  private[graft] val symbolDerivations =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** The one derivation job behind [[Model.symbolRows]]: run the
    * alphabet scan + window once and collect the bounded result to the
    * driver (ordered by id). Callers go through the memo, never here.
    */
  private[operators] def deriveSymbolRows(model: Model): Seq[(String, Int)] = {
    symbolDerivations.incrementAndGet()
    val spark = model.vocab.sparkSession
    import org.apache.spark.sql.expressions.Window
    // initial symbols, derived exactly as symbolize() produces them
    val base = model.vocab
      .select(explode(split(symbolize(col("w")), " ")).as("sym"))
      .distinct()
      .withColumn("mrank", lit(0))
    val merged = spark.createDataFrame(
      model.merges.map(r => (r.merged, r.rank))).toDF("sym", "mrank")
    base.union(merged)
      .groupBy("sym").agg(min(col("mrank")).as("mrank"))
      .withColumn("id",
        (row_number().over(Window.orderBy(col("mrank"), col("sym"))) - 1)
          .cast("int"))
      .select("sym", "id")
      .orderBy("id")
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1)))
  }

  /** The reserved out-of-vocabulary token id of a model: one past the
    * last [[symbolTable]] id (= the table's row count — deterministic
    * because the table is; NOT necessarily `|Σ| + numMerges`, since a
    * merged string colliding with an earlier symbol keeps its first
    * assignment). Free after the first [[Model.symbolRows]] derivation
    * (driver-side length, no job). Only [[applyModel]] under
    * `spark.graft.bpe.oov=unk` emits it; no real symbol can collide
    * with it because ids are dense.
    */
  def unkId(model: Model): Int = model.symbolRows.length

  /** Per-document token-ID sequences under a learned model — the
    * tokenizer OUTPUT a training run consumes (vs [[encodeCounts]]'s
    * counts-only summary). Each in-vocabulary word (corpus order
    * preserved via posexplode positions; out-of-vocabulary tokens
    * skipped by the inner join, per the learn contract) expands to its
    * final symbols, each mapped through [[symbolTable]]. Returns
    * `(idCol, token_ids array<int>)` for every document with at least
    * one in-vocabulary token. Encodes the TRAINING corpus (the words in
    * `model.vocab`); for arbitrary text use [[applyModel]].
    *
    * Scale shape: two map-side explodes, one vocabulary join (size-gated
    * broadcast — see [[encodeCounts]]'s note on why it is NOT hinted),
    * one broadcast join against the bounded symbol table, and one
    * per-document aggregation. The only interpreted HOF (`transform`)
    * runs once per output row over that row's final list.
    */
  def encodeIds(
      df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val mode = model.pretokenizer
    val perWord = model.vocab.select(col("w"), split(col("sym"), " ").as("sl"))
    val docw = df
      .select(col(idCol),
        posexplode(rawTokens(col(textCol), mode)).as(Seq("wpos", "w0")))
      .select(col(idCol), col("wpos"), markSpace(col("w0"), mode).as("w"))
      .join(perWord, Seq("w"))
    docw
      .select(col(idCol), col("wpos"),
        posexplode(col("sl")).as(Seq("spos", "sym")))
      .join(broadcast(symbolTable(model)), Seq("sym"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(
        struct(col("wpos"), col("spos"), col("id")))).as("tl"))
      .select(col(idCol),
        transform(col("tl"), t => t.getField("id")).as("token_ids"))
  }

  /** Invert the tokenizer: token-id sequences back to text — the
    * detokenizer every training/serving loop needs to inspect,
    * display, or round-trip its data. Each id maps through the
    * broadcast [[symbolTable]] to its symbol string; symbols
    * concatenate in sequence order and the `</w>` end-of-word markers
    * become spaces, so `decodeIds(encodeIds(x)) == pre-tokenized(x)`
    * EXACTLY (drop-mode contract; the q125 oracle checks precisely
    * that round trip).
    *
    * Reserved-page ids decode LOSS-FREE: a maximal run of consecutive
    * `bytes`-mode fallback ids (`unkId + 1 + b`, the page one past the
    * UNK id) reassembles into its UTF-8 bytes and decodes back to the
    * original text — GPT-2-style byte fallback is reversible, so
    * `oov=bytes` round-trips END TO END (q127's oracle checks exactly
    * that). A byte run carries no word-boundary marker, so adjacent
    * OOV words legitimately fuse (documented encode-side too). Only
    * the true [[unkId]] stays irreversible by definition — it decodes
    * as `U+FFFD` WITH a word boundary (in `unk` mode one UNK is one
    * whole word, so spacing is recoverable); ids beyond the page
    * render as bare `U+FFFD`. A hand-crafted id array whose byte run
    * is not valid UTF-8 fails the ANSI-mode charset decode loudly
    * (MALFORMED_CHARACTER_CODING) rather than silently mojibake-ing —
    * encoder output is always valid by construction.
    *
    * Scale shape: one explode, one broadcast join on the bounded
    * symbol table, one per-document aggregation; the byte-run
    * reassembly is a single linear `aggregate` fold per document over
    * the collected fragment list (symbols pass through, byte ids
    * accumulate as hex until a non-byte fragment or the end flushes
    * them through `unhex` + UTF-8 decode). The `</w>`→space rewrite
    * happens per SYMBOL fragment, so byte-decoded content that
    * happens to contain the literal text `</w>` is never corrupted.
    */
  def decodeIds(
      df: DataFrame, idCol: String, idsCol: String,
      model: Model): DataFrame = {
    val unk = unkId(model)
    val mode = model.pretokenizer
    val tab = broadcast(symbolTable(model)
      .select(col("id").as("__tid"), col("sym")))
    // boundary rewrite per mode: whitespace turns `</w>` into the
    // space the split consumed; bytelevel DROPS the marker (tokens
    // abut directly) and turns the leading-space `Ġ` back into its
    // space — so both modes invert their own pre-tokenizer exactly
    def boundary(sym: Column): Column =
      if (mode == "whitespace") replace(sym, lit("</w>"), lit(" "))
      else replace(replace(sym, lit("</w>"), lit("")),
        lit(SpaceMarker), lit(" "))
    // per-token fragment: a (boundary-rewritten) symbol string, or a
    // 2-hex-digit byte destined for run reassembly
    val frag =
      when(col("sym").isNotNull,
        struct(boundary(col("sym")).as("sym"),
          lit(null).cast("string").as("hx")))
      .when(col("__tid") === unk,
        struct(lit(if (mode == "whitespace") "� " else "�").as("sym"),
          lit(null).cast("string").as("hx")))
      .when(col("__tid") > unk && col("__tid") <= unk + 256,
        struct(lit(null).cast("string").as("sym"),
          lpad(hex(col("__tid") - unk - 1), 2, "0").as("hx")))
      .otherwise(
        struct(lit("�").as("sym"), lit(null).cast("string").as("hx")))
    def flush(hx: Column): Column =
      when(hx === "", lit("")).otherwise(decode(unhex(hx), "UTF-8"))
    df.select(col(idCol), posexplode(col(idsCol)).as(Seq("__pos", "__tid")))
      .join(tab, Seq("__tid"), "left")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__pos"), frag.as("f"))))
        .as("sl"))
      .select(col(idCol), {
        val folded = aggregate(
          transform(col("sl"), t => t.getField("f")),
          struct(lit("").as("out"), lit("").as("hx")),
          (acc, e) => when(e.getField("hx").isNotNull,
              struct(acc.getField("out").as("out"),
                concat(acc.getField("hx"), e.getField("hx")).as("hx")))
            .otherwise(struct(
              concat(acc.getField("out"), flush(acc.getField("hx")),
                e.getField("sym")).as("out"),
              lit("").as("hx"))),
          acc => concat(acc.getField("out"), flush(acc.getField("hx"))))
        // whitespace mode's last `</w>` leaves a trailing space to
        // trim; bytelevel emits no boundary spaces at all, and an
        // rtrim there could eat a byte-decoded legitimate trailing
        // space — trim only where the artifact exists
        (if (mode == "whitespace") rtrim(folded) else folded)
          .as("decoded")
      })
  }

  /** Tokenize ARBITRARY text under a saved model — the merge-replay
    * encoder a real tokenizer applies to unseen documents (subword-nmt
    * `apply_bpe`): the distinct pre-tokenized words of the INPUT corpus
    * are symbolized and the saved rules replayed over them in rank
    * order, so a word never seen at train time still tokenizes by the
    * rules. Replay semantics are training-equivalent — each rule is
    * applied exactly once at its rank (leftmost non-overlapping), the
    * same single-pass-per-rule order [[learnMerges]] used — so on the
    * training corpus this equals [[encodeIds]] exactly (spec-pinned).
    * Words the pre-tokenizer rejects, and words containing a character
    * outside the training alphabet (no symbol id exists), follow the
    * [[OovModeConf]] session conf (read once, at plan-construction
    * time): `drop` (default) skips them — the OOV contract of the
    * learn step — `unk` emits the single reserved [[unkId]] token per
    * such word, and `bytes` emits the word's UTF-8 byte sequence
    * shifted onto the reserved page `[unkId+1, unkId+256]` (byte `b` →
    * id `unkId + 1 + b` — one past the UNK id, so a NUL byte and the
    * UNK token can never share an id;
    * the [[graft.plans.Utf8Bytes]] native expression
    * reads the engine's own UTF-8 payload, so supplementary-plane
    * characters encode correctly, not as CESU-8 surrogate halves).
    * Returns `(idCol, token_ids array<int>)` for every document with
    * ≥1 tokenizable word (under `unk`/`bytes`, every non-empty word
    * tokenizes).
    *
    * `maxWordLen` must match the value the model was trained with.
    *
    * Scale shape: the replay loop runs on the DISTINCT-word relation
    * (vocabulary-sized, not corpus-sized), chunked `rulesPerChunk`
    * literal replaces per projection inside one doubled-separator form
    * ([[applyMerges]]) with a [[Lineage.cut]] per chunk — so a
    * 32k-rule model costs ~32k/chunk bounded-size projections, no
    * driver data traffic at all. The id mapping broadcasts the bounded
    * [[symbolTable]]; the corpus join on `w` is size-gated, not hinted
    * (the [[encodeCounts]] rationale).
    */
  def applyModel(
      df: DataFrame, idCol: String, textCol: String, model: Model,
      maxWordLen: Int = 32, rulesPerChunk: Int = 64): DataFrame = {
    require(rulesPerChunk > 0, s"rulesPerChunk=$rulesPerChunk must be positive")
    val oovMode = df.sparkSession.conf.getOption(OovModeConf)
      .getOrElse("drop") match {
        case m @ ("drop" | "unk" | "bytes") => m
        case other => throw new IllegalArgumentException(
          s"$OovModeConf=$other (expected drop|unk|bytes)")
      }
    val oovKeep = oovMode != "drop"
    val mode = model.pretokenizer
    val pretokOk = pretokAdmit(col("w"), mode, maxWordLen)
    // persisted: the exploded long form feeds BOTH the distinct-word
    // build and the final per-document join — without the persist the
    // second reference re-runs the whole split+posexplode+regex corpus
    // pass (MEMORY_AND_DISK; CacheRegistry-tracked like every operator
    // intermediate — evicts under pressure, in which case Spark falls
    // back to exactly that recompute). Under `unk`/`bytes` ALL
    // non-empty words stay (each needs a token); under `drop` the
    // pre-tokenizer filter prunes before the persist.
    val raw = df.select(col(idCol),
        posexplode(rawTokens(col(textCol), mode)).as(Seq("wpos", "w0")))
      .select(col(idCol), col("wpos"), markSpace(col("w0"), mode).as("w"))
    val docw = CacheRegistry.track(
      (if (oovKeep) raw.filter(col("w") =!= "") else raw.filter(pretokOk))
        .persist())
    // the replay loop runs on pre-tokenizer-admitted words either way
    // (a rejected word has no symbolization to replay)
    var wsym = Lineage.cut(
      (if (oovKeep) docw.filter(pretokOk) else docw)
        .select("w").distinct().withColumn("sym", symbolize(col("w"))))
    model.merges.sortBy(_.rank).grouped(rulesPerChunk).foreach { chunk =>
      val prev = wsym
      wsym = Lineage.cut(wsym.withColumn("sym",
        applyMerges(col("sym"), chunk.map(r => (r.left, r.right)))))
      Lineage.release(prev)
    }
    val tab = broadcast(symbolTable(model))
    val perSym = wsym
      .select(col("w"), posexplode(split(col("sym"), " ")).as(Seq("spos", "sym")))
      .join(tab, Seq("sym"), "left")
      .groupBy("w")
      .agg(
        array_sort(collect_list(struct(col("spos"), col("id")))).as("sl"),
        max(col("id").isNull.cast("int")).as("oov"))
    val joined =
      if (oovKeep) {
        // out-of-alphabet words (oov=1) and pre-tokenizer-rejected
        // words (absent from perSym — left-join miss) both fall back:
        // under `unk` to ONE reserved token, under `bytes` to the
        // word's UTF-8 bytes shifted onto the reserved page (byte b →
        // unkId + 1 + b: the page starts one PAST the UNK id, so byte
        // 0x00 can never collide with the UNK token and an id stream
        // is unambiguous between the two modes)
        val reservedBase = unkId(model)
        // bytelevel byte-fallback encodes the token with its leading
        // `Ġ` restored to the space it stands for, so the byte page
        // round-trips the ORIGINAL spacing (the decode side's byte
        // path emits raw text, never the marker); a literal Ġ in the
        // input shares this rewrite — the documented ambiguity
        val fallbackSrc: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          if (mode == "whitespace") identity
          else w => replace(w, lit(SpaceMarker), lit(" "))
        val fallback: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          if (oovMode == "unk") _ => array(lit(reservedBase))
          else w => transform(
            graft.plans.GraftFunctions.utf8Bytes(fallbackSrc(w)),
            b => b + lit(reservedBase + 1))
        val perWord = perSym.select(col("w"),
          when(col("oov") === 1, fallback(col("w")))
            .otherwise(transform(col("sl"), t => t.getField("id")))
            .as("ids"))
        docw.join(perWord, Seq("w"), "left")
          .withColumn("ids", coalesce(col("ids"), fallback(col("w"))))
      } else {
        val perWord = perSym.filter(col("oov") === 0)
          .select(col("w"),
            transform(col("sl"), t => t.getField("id")).as("ids"))
        docw.join(perWord, Seq("w"))
      }
    joined
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("wpos"), col("ids")))).as("tl"))
      .select(col(idCol),
        flatten(transform(col("tl"), t => t.getField("ids"))).as("token_ids"))
  }

  /** Per-document BPE token counts under a learned model: each in-vocab
    * word costs `len(split(final_sym))` tokens. The corpus long form
    * joins the vocabulary relation — out-of-vocabulary tokens are
    * skipped by the inner join, per the learn contract. No broadcast
    * hint: the vocab is persisted with known size, so size-gated
    * dispatch broadcasts it when small — but at 100 TB corpus scale a
    * Zipf vocabulary is ~10⁸ rows (several GB), where forcing a
    * broadcast would OOM the driver and a shuffled hash join is right.
    */
  def encodeCounts(
      df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val mode = model.pretokenizer
    val perWord = model.vocab
      .select(col("w"), size(split(col("sym"), " ")).cast("long").as("ntok"))
    df.select(col(idCol), explode(rawTokens(col(textCol), mode)).as("w0"))
      .select(col(idCol), markSpace(col("w0"), mode).as("w"))
      .join(perWord, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_bpe_tokens"))
  }
}
