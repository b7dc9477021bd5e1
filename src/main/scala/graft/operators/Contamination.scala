package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents sharing
  * n-gram shingles with an evaluation set (the step every serious
  * pretraining pipeline runs before training — eval items leaking into
  * the corpus inflate benchmark scores).
  *
  * Long-form shape: both sides explode to (id, shingle) rows
  * ([[Dedup.shingleRows]] — codegen window, no interpreted lambdas), the
  * equi-join on the shingle key counts shared shingles per (corpus doc,
  * benchmark doc), and `minShared` prunes noise matches. One shuffle on
  * the shingle key; the benchmark side is tiny by definition, so it
  * broadcasts. Joining on the shingle STRING keeps the semantics exact
  * and oracle-portable; at corpus scale, pre-hash both sides with the
  * same 64-bit hash (the join keys never reach the output, only counts
  * do — a collision risk of ~n²/2⁶⁴ on the key space).
  */
object Contamination {

  /** (corpus_id, bench_id, n_shared) for every contaminated pair with at
    * least `minShared` shared n-gram shingles.
    */
  def ngramOverlap(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int,
      minShared: Long): DataFrame = {
    val c = Dedup.shingleRows(corpus, idCol, textCol, shingleN)
      .select(col(idCol).as("corpus_id"), col("sh")).distinct()
    val b = Dedup.shingleRows(benchmark, idCol, textCol, shingleN)
      .select(col(idCol).as("bench_id"), col("sh")).distinct()
    c.join(broadcast(b), Seq("sh"))
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[ngramOverlap]] normalized by the BENCHMARK item's shingle
    * population — the published fraction rule (PaLM's "70% of 8-grams
    * seen", GPT-4's 50-char-substring variant): a pair is contaminated
    * when `n_shared / bench_total ≥ minFrac`, so a short eval item
    * fully contained in a long document is caught even though its
    * absolute shared count is small (the case a fixed `minShared`
    * misses). The fraction is rounded to 6 before the threshold so
    * the flagged set replays exactly cross-engine.
    *
    * Same plan as [[ngramOverlap]] plus one broadcast join against
    * the per-item totals (benchmark-sized, tiny by definition).
    */
  def overlapFraction(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int,
      minFrac: Double): DataFrame = {
    require(minFrac > 0 && minFrac <= 1,
      s"minFrac=$minFrac must be in (0, 1]")
    val c = Dedup.shingleRows(corpus, idCol, textCol, shingleN)
      .select(col(idCol).as("corpus_id"), col("sh")).distinct()
    val b = CacheRegistry.track(
      Dedup.shingleRows(benchmark, idCol, textCol, shingleN)
        .select(col(idCol).as("bench_id"), col("sh")).distinct()
        .persist())
    val totals = b.groupBy("bench_id")
      .agg(count(lit(1)).as("bench_total"))
    c.join(broadcast(b), Seq("sh"))
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals), Seq("bench_id"))
      .withColumn("overlap_frac",
        round(col("n_shared").cast("double") /
          col("bench_total").cast("double"), 6))
      .filter(col("overlap_frac") >= minFrac)
      .select(col("corpus_id"), col("bench_id"), col("n_shared"),
        col("bench_total"), col("overlap_frac"))
  }

  /** Corpus rows with NO contaminated pairing — the decontaminated set. */
  def decontaminated(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int,
      minShared: Long): DataFrame =
    corpus.join(
      ngramOverlap(corpus, benchmark, idCol, textCol, shingleN, minShared)
        .select(col("corpus_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** SPAN-level contamination evidence — [[ngramOverlap]]'s count says
    * "these two share k shingles"; this says WHERE and HOW LONG: every
    * maximal contiguous token span the corpus document shares verbatim
    * with a benchmark item (the consecutive-overlap criterion modern
    * decontamination uses — e.g. PaLM/GPT-3-style ≥ L-token exact
    * matches — rather than bag-of-shingles counts that fire on common
    * phrases). The [[graft.operators.Dedup.sharedSpanPairs]] diagonal
    * gaps-and-islands machinery, specialized to a CROSS-side join: the
    * benchmark side is tiny by definition, so its shingle relation
    * broadcasts and the corpus never pairs with itself — per-corpus-doc
    * cost follows the benchmark hit rate, not the corpus.
    *
    * Returns one row per maximal shared span:
    * `(corpus_id, bench_id, start_corpus, start_bench, span_tokens)`
    * with `span_tokens >= minSpan`, 0-based token starts. Joining on
    * shingle STRINGS (oracle-exact); pre-hash both sides at corpus
    * scale (the [[ngramOverlap]] note).
    */
  def spanContamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, minSpan: Int,
      shingleN: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shingleN > 0, s"shingleN=$shingleN must be positive")
    require(minSpan >= shingleN,
      s"minSpan=$minSpan must be >= shingleN=$shingleN")
    val c = Dedup.shingleRowsPos(corpus, idCol, textCol, shingleN,
        includeSubN = false)
      .select(col(idCol).as("corpus_id"), col("pos").as("__pc"), col("sh"))
    val b = Dedup.shingleRowsPos(benchmark, idCol, textCol, shingleN,
        includeSubN = false)
      .select(col(idCol).as("bench_id"), col("pos").as("__pb"), col("sh"))
    val matches = c.join(broadcast(b), Seq("sh"))
      .select(col("corpus_id"), col("bench_id"), col("__pc"), col("__pb"),
        (col("__pc") - col("__pb")).as("__diag"))
    val wd = Window
      .partitionBy(col("corpus_id"), col("bench_id"), col("__diag"))
      .orderBy(col("__pc"))
    matches
      .withColumn("__grp", col("__pc") - row_number().over(wd))
      .groupBy(col("corpus_id"), col("bench_id"), col("__diag"),
        col("__grp"))
      .agg(min(col("__pc")).cast("long").as("start_corpus"),
        min(col("__pb")).cast("long").as("start_bench"),
        (count(lit(1)) + (shingleN - 1)).cast("long").as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .select(col("corpus_id"), col("bench_id"), col("start_corpus"),
        col("start_bench"), col("span_tokens"))
  }

  /** [[spanContamination]] APPLIED — surgical decontamination: instead
    * of dropping every flagged document ([[decontaminated]]'s
    * whole-doc rule), cut ONLY the leaked spans and keep the rest (the
    * [[graft.operators.Dedup.cutRepeatedSpans]] convention: tokens
    * re-joined with single spaces — the tokenizer's normal form; a doc
    * that was one big leak comes back empty, not dropped). Overlapping
    * spans from different benchmark items remove each token once —
    * `removed_tokens` counts tokens, not span-length sums.
    *
    * Returns every corpus row as
    * `(id, clean_text, n_spans, removed_tokens)`.
    */
  def cutContamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, minSpan: Int,
      shingleN: Int = 8): DataFrame = {
    val spans = CacheRegistry.track(
      spanContamination(corpus, benchmark, idCol, textCol, minSpan,
        shingleN).persist())
    cutSpansAt(corpus, idCol, textCol,
      spans.select(col("corpus_id"), col("start_corpus"),
        col("span_tokens")))
  }

  /** The generic span CUTTER the surgical paths share: remove from
    * each document every token covered by a `(corpus_id,
    * start_corpus, span_tokens)` evidence row and reassemble the
    * remainder in order (single-space normal form). Overlapping spans
    * remove each token once; documents with no evidence pass through
    * verbatim; a fully-covered document comes back empty, not
    * dropped. Evidence can come from benchmark contamination
    * ([[cutContamination]]) or corpus-internal duplication
    * ([[graft.operators.Dedup.cutSharedSpans]]) — the cut tail is
    * identical: one anti-range join at token granularity + one
    * id-keyed ordered reassembly, both partitioned on the document
    * id.
    */
  private[operators] def cutSpansAt(corpus: DataFrame, idCol: String,
      textCol: String, spans: DataFrame): DataFrame = {
    val stats = spans.groupBy(col("corpus_id"))
      .agg(count(lit(1)).as("n_spans"))
      .select(col("corpus_id").as(idCol), col("n_spans"))
    val toks = corpus.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val nTok = corpus.select(col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("__n"))
    val kept = toks.join(spans,
      toks(idCol) === spans("corpus_id") &&
        col("pos") >= col("start_corpus") &&
        col("pos") < col("start_corpus") + col("span_tokens"),
      "left_anti")
    val clean = kept.groupBy(idCol).agg(
      array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ").as("clean_text"),
      count(lit(1)).as("__kept"))
    nTok
      .join(clean, Seq(idCol), "left")
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (col("__n") - coalesce(col("__kept"), lit(0L)))
          .as("removed_tokens"))
  }
}
