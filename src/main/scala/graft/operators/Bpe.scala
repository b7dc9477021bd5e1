package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the tokenizer-training step of an LLM data pipeline.
  *
  * Scale shape (the reason real trainers — subword-nmt, SentencePiece,
  * HF tokenizers — all do this): the corpus is touched ONCE, by a single
  * tokenize + word-count shuffle. Every merge iteration then runs on the
  * distinct-word table, which is smaller than the corpus by the word
  * frequency distribution (Zipf: ~10⁸ distinct words for a 100 TB web
  * corpus vs ~10¹³ tokens). Per iteration: one map-side symbol-pair
  * explode + one tiny aggregation, and exactly ONE row crosses to the
  * driver (the argmax pair). The chosen rule is applied as a literal
  * string `replace` — map-side, whole-stage codegen, no UDF.
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
  * [[Dedup.prefixJaccardPairs]]).
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
  private def symbolize(w: org.apache.spark.sql.Column) =
    concat(regexp_replace(w, "(.)", "$1 "), lit("</w>"))

  /** Learn `numMerges` merge rules from whitespace-tokenized `textCol`.
    *
    * Only words matching `^[a-z]+$` with length ≤ `maxWordLen` enter the
    * vocabulary (symbols then never contain spaces or separators, which
    * keeps the literal-replace application exact); other tokens are
    * out-of-vocabulary by contract, the standard pre-tokenizer split.
    *
    * Each iteration runs two small Spark jobs — the argmax collect and
    * the lineage-cut materialization of the updated vocabulary
    * ([[Lineage.cut]], which keeps every iteration's plan constant-size)
    * — and the driver sees one argmax row per merge. Stops early if no
    * adjacent pair is left (fully merged vocabulary).
    */
  def learnMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWordLen: Int = 32): Model = {
    require(numMerges > 0, s"numMerges=$numMerges must be positive")
    require(maxWordLen > 0, s"maxWordLen=$maxWordLen must be positive")
    // the vocabulary is loop-carried state: lineage-cut each iteration
    // ([[Lineage.cut]]) so iteration k's plan is a constant-size leaf,
    // not a k-deep replace chain the analyzer re-walks every iteration
    var words = Lineage.cut(
      df.select(explode(split(col(textCol), " ")).as("w"))
        .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxWordLen)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .withColumn("sym", symbolize(col("w"))))

    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      // adjacent symbol pairs weighted by word count — posexplode keeping
      // the array column, pair partner via arr[pos+1] (GetArrayItem,
      // codegen; bounds-safe under ANSI because of the pos filter). All
      // map-side: the only shuffle per iteration is the tiny (a,b) agg —
      // a lead() window here would add a per-word shuffle+sort of the
      // exploded symbol table every iteration for no semantic gain.
      val syms = words.select(col("cnt"), split(col("sym"), " ").as("syms"))
      val pairs = syms
        .select(col("cnt"), col("syms"), posexplode(col("syms")))
        .filter(col("pos") < size(col("syms")) - 1)
        .select(col("cnt"), col("col").as("a"),
          col("syms")(col("pos") + 1).as("b"))
        .groupBy("a", "b")
        .agg(sum(col("cnt")).as("pc"))
      val best = pairs
        .agg(min(struct(negate(col("pc")), col("a"), col("b"))).as("m"))
        .select(col("m")).collect()
      if (best.isEmpty || best(0).isNullAt(0)) exhausted = true
      else {
        val m = best(0).getStruct(0)
        val (pc, a, b) = (-m.getLong(0), m.getString(1), m.getString(2))
        rules += MergeRule(k + 1, a, b, a + b, pc)
        // leftmost non-overlapping application: double the separators so
        // " a  b " owns one boundary space on each side, then re-canonize
        val doubled = concat(lit(" "),
          call_function("replace", col("sym"), lit(" "), lit("  ")),
          lit(" "))
        val merged = call_function("replace", doubled,
          lit(s" $a  $b "), lit(s" ${a + b} "))
        val prev = words
        words = Lineage.cut(words.withColumn("sym",
          trim(regexp_replace(merged, " +", " "))))
        Lineage.release(prev) // k-1 vocab dead once the k-th cut is real
        k += 1
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
