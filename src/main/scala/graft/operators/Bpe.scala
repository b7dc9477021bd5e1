package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the tokenizer-training step of an LLM data pipeline.
  *
  * Scale shape (the reason real trainers — subword-nmt, SentencePiece,
  * HF tokenizers — all do this): the corpus is touched ONCE, by a single
  * tokenize + word-count shuffle, and the adjacent-pair counts are built
  * ONCE, by a single explode over the distinct-word table. Every merge
  * iteration after that is INCREMENTAL, the standard trainers'
  * formulation (subword-nmt's queue update): after choosing pair (a,b),
  * only the words whose symbol string actually contains the `a b`
  * boundary are re-exploded — a Zipf-tiny subset after the first few
  * merges — and their old pairs are subtracted / new pairs added to a
  * loop-carried pair-count relation ([[Lineage.cut]] state, partitioned
  * by (a,b) so the per-iteration delta join co-locates without
  * reshuffling the state). Per iteration: one map-side filter of the
  * vocabulary leaf, one explode of the affected subset, one tiny delta
  * aggregation, and exactly ONE row crosses to the driver (the argmax
  * pair). Nothing per-iteration explodes or shuffles the full
  * vocabulary — the full-rescan alternative (one explode+shuffle of ALL
  * words per merge) is 32k corpus-wide passes at a real tokenizer's
  * merge count, months of work the incremental path avoids. The chosen
  * rule is applied as a literal string `replace` — map-side, whole-stage
  * codegen, no UDF.
  *
  * Determinism: the argmax tiebreak is (count DESC, left ASC, right ASC)
  * via `min(struct(-count, left, right))` — a partial-aggregatable
  * reduction, no global sort. Merge application is leftmost
  * non-overlapping (the reference greedy semantics), implemented by
  * doubling the symbol separators so adjacent occurrences cannot steal
  * each other's boundary space (`" a  b "` consumes one space per side,
  * leaving one for the next match).
  *
  * Words are held as canonical single-space symbol strings
  * (`"s p a r k </w>"`) rather than arrays so every step stays in
  * codegen'd string expressions (the interpreted-HOF cost note on
  * [[Dedup.prefixJaccardPairs]]). Symbols never contain spaces — the
  * pre-tokenizer admits only all-letter words — which makes both the
  * literal-replace application and the ` a b ` containment probe exact.
  */
object Bpe {

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
  final case class Model(merges: Seq[MergeRule], vocab: DataFrame)

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
      df: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike("^\\p{L}+$") && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("sym", symbolize(col("w")))

  /** Weighted adjacent-pair counts `(a, b, pc)` of a `(cnt, sym)`
    * relation — posexplode keeping the array column, pair partner via
    * `arr[pos+1]` (GetArrayItem, codegen; bounds-safe under ANSI because
    * of the pos filter). All map-side: the only shuffle is the (a,b)
    * agg — a lead() window here would add a per-word shuffle+sort of
    * the exploded symbol table for no semantic gain. Negative `cnt`
    * rows are the subtraction half of a delta (see [[learnMerges]]).
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

  /** (count DESC, left ASC, right ASC) argmax — ONE row to the driver;
    * None when no pair remains (fully merged vocabulary).
    */
  private def argmax(counts: DataFrame): Option[(Long, String, String)] = {
    val best = counts
      .agg(min(struct(negate(col("pc")), col("a"), col("b"))).as("m"))
      .select(col("m")).collect()
    if (best.isEmpty || best(0).isNullAt(0)) None
    else {
      val m = best(0).getStruct(0)
      Some((-m.getLong(0), m.getString(1), m.getString(2)))
    }
  }

  /** True iff the canonical symbol string contains symbol `a` directly
    * followed by symbol `b` (padding both sides makes word-edge
    * occurrences visible; symbols are space-free, so the probe cannot
    * false-positive on symbol substrings like `ab`).
    */
  private def containsPair(a: String, b: String): Column =
    instr(concat(lit(" "), col("sym"), lit(" ")), lit(s" $a $b ")) > 0

  /** Leftmost non-overlapping application of merge (a,b): double the
    * separators so `" a  b "` owns one boundary space on each side,
    * replace, then re-canonize back to single spaces.
    */
  private def applyMerge(a: String, b: String): Column = {
    val doubled = concat(lit(" "),
      call_function("replace", col("sym"), lit(" "), lit("  ")),
      lit(" "))
    val merged = call_function("replace", doubled,
      lit(s" $a  $b "), lit(s" ${a + b} "))
    trim(regexp_replace(merged, " +", " "))
  }

  /** Learn `numMerges` merge rules from whitespace-tokenized `textCol`
    * — incremental pair-count maintenance (module doc).
    *
    * Loop-carried state, both [[Lineage.cut]] each iteration so every
    * plan is a constant-size leaf: the vocabulary `(w, cnt, sym)` and
    * the pair-count relation `(a, b, pc)`. Each iteration runs three
    * small Spark jobs — the argmax collect, the delta-join
    * materialization of the updated counts, and the conditional-replace
    * materialization of the updated vocabulary — and the driver sees
    * one argmax row per merge. Stops early if no adjacent pair is left.
    */
  def learnMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWordLen: Int = 32): Model =
    learnMergesTimed(df, textCol, numMerges, maxWordLen, null)

  /** [[learnMerges]] with a per-iteration timing hook (rank, seconds) —
    * how [[graft.BpeStress]] shows the incremental cost decaying with
    * merge rank while the full rescan stays flat.
    */
  private[graft] def learnMergesTimed(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWordLen: Int, onIter: (Int, Double) => Unit): Model = {
    require(numMerges > 0, s"numMerges=$numMerges must be positive")
    require(maxWordLen > 0, s"maxWordLen=$maxWordLen must be positive")
    var words = Lineage.cut(initialVocab(df, textCol, maxWordLen))
    // the ONE full-vocabulary explode; thereafter the counts relation is
    // maintained by deltas. Partitioned by (a,b) so each iteration's
    // delta join shuffles only the (tiny) delta side.
    var counts = Lineage.cut(
      pairCounts(words.select(col("cnt"), col("sym")))
        .repartition(col("a"), col("b")))

    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val t0 = System.nanoTime()
      argmax(counts) match {
        case None => exhausted = true
        case Some((pc, a, b)) =>
          rules += MergeRule(k + 1, a, b, a + b, pc)
          val touched = containsPair(a, b)
          val newSym = applyMerge(a, b)
          // pair-count delta from the affected words ONLY: subtract
          // their old pairs, add their new ones. Words without the
          // `a b` boundary keep their symbols, hence their pairs.
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
          val prevW = words
          words = Lineage.cut(words.withColumn("sym",
            when(touched, newSym).otherwise(col("sym"))))
          Lineage.release(prevC) // k-1 state dead once the k-th cut is real
          Lineage.release(prevW)
          k += 1
          if (onIter != null) onIter(k, (System.nanoTime() - t0) / 1e9)
      }
    }
    Model(rules.toSeq, words)
  }

  /** The pre-incremental formulation — recompute ALL pair counts from
    * the full vocabulary every iteration. Kept (test-visible only) as
    * the equality reference for [[learnMerges]]: the incremental path
    * must choose identical rules and produce an identical vocabulary at
    * every iteration, and [[graft.ScaleStress]] measures the
    * per-iteration cost gap as the vocabulary grows.
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
      argmax(pairCounts(words.select(col("cnt"), col("sym")))) match {
        case None => exhausted = true
        case Some((pc, a, b)) =>
          rules += MergeRule(k + 1, a, b, a + b, pc)
          val prev = words
          words = Lineage.cut(words.withColumn("sym",
            when(containsPair(a, b), applyMerge(a, b))
              .otherwise(col("sym"))))
          Lineage.release(prev)
          k += 1
          if (onIter != null) onIter(k, (System.nanoTime() - t0) / 1e9)
      }
    }
    Model(rules.toSeq, words)
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

  /** Deterministic symbol→id table for a learned model, as a (tiny)
    * DataFrame `(sym, id)` — ids are dense ints: the base alphabet
    * (every initial symbol = distinct word characters plus `</w>`)
    * sorted lexicographically takes 0..|Σ|-1, then merged symbols in
    * merge-rank order. A merged string that collides with an earlier
    * symbol (two merge paths CAN fuse to the same string — e.g. (a,bc)
    * after (ab,c)) keeps its FIRST assignment, so the map is a
    * function. The table is bounded (|alphabet| + numMerges rows), so
    * the unpartitioned row_number window and the downstream broadcast
    * join are both safe at any corpus scale.
    */
  def symbolTable(model: Model): DataFrame = {
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
  }

  /** Per-document token-ID sequences under a learned model — the
    * tokenizer OUTPUT a training run consumes (vs [[encodeCounts]]'s
    * counts-only summary). Each in-vocabulary word (corpus order
    * preserved via posexplode positions; out-of-vocabulary tokens
    * skipped by the inner join, per the learn contract) expands to its
    * final symbols, each mapped through [[symbolTable]]. Returns
    * `(idCol, token_ids array<int>)` for every document with at least
    * one in-vocabulary token.
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
    val perWord = model.vocab.select(col("w"), split(col("sym"), " ").as("sl"))
    val docw = df
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("wpos", "w")))
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
    val perWord = model.vocab
      .select(col("w"), size(split(col("sym"), " ")).cast("long").as("ntok"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .join(perWord, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_bpe_tokens"))
  }
}
