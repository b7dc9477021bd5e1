package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  * All are pure column expressions (whole-stage codegen, no UDFs) so they
  * run at scan speed over a 100 TB corpus and push down through Catalyst.
  */
object TextAnalysis {

  /** Whitespace tokens, empty tokens removed. Single-space split keeps
    * semantics portable across engines; `tokenizeRegex` is the BPE-ish
    * variant.
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** BPE-ish tokenization: letter-runs, digit-runs, or single punctuation —
    * the common pre-tokenizer shape (GPT-2 style, simplified).
    */
  def tokenizeRegex(text: Column): Column =
    filter(split(regexp_replace(text, "([^\\p{L}\\p{N}\\s])", " $1 "), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Quality-score feature bundle. Ratios are exact-count divisions —
    * deterministic doubles on any engine.
    */
  def qualityFeatures(df: DataFrame, textCol: String, stopwords: Seq[String]): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks).cast("long")
    val stopHits = size(filter(toks, w => lower(w).isInCollection(stopwords))).cast("long")
    df.withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", nTok)
      .withColumn("n_stop", stopHits)
      .withColumn(
        "stop_ratio",
        when(nTok > 0, stopHits.cast("double") / nTok.cast("double")).otherwise(lit(0.0)))
      .withColumn(
        "mean_token_len",
        when(nTok > 0,
          aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
            nTok.cast("double")).otherwise(lit(0.0)))
  }

  /** n-gram language ID heuristic: score = stopword-hit ratio per language
    * wordlist; predicted language = argmax (deterministic tie-break by
    * language name). Trivially extended with more lists; runs as one pass
    * of array expressions.
    */
  def langId(df: DataFrame, textCol: String, wordlists: Map[String, Seq[String]]): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val nTok = size(toks).cast("double")
    val scored = wordlists.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(
        s"score_$lang",
        when(size(toks) > 0,
          size(filter(toks, w => w.isInCollection(words))).cast("double") / nTok)
          .otherwise(lit(0.0)))
    }
    // linear argmax: greatest over (score, -index) structs — a fold that
    // re-nests the running best would grow the expression tree 2^|langs|
    val langs = wordlists.keys.toSeq.sorted
    val bestStruct =
      if (langs.size == 1) struct(col(s"score_${langs.head}").as("s"), lit(0).as("negIdx"))
      else greatest(langs.zipWithIndex.map { case (lang, i) =>
        struct(col(s"score_$lang").as("s"), lit(-i).as("negIdx"))
      }: _*)
    val predFromIdx = langs.zipWithIndex.foldLeft(lit(langs.head)) {
      case (acc, (lang, i)) =>
        when(bestStruct.getField("negIdx") === -i, lit(lang)).otherwise(acc)
    }
    scored.withColumn("pred_lang", predFromIdx)
  }

  /** Content fingerprint: md5 of case/whitespace-normalized text (runs
    * of whitespace collapse to one space) — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Deterministic 48-bit rolling (polynomial) hash of the token stream —
    * document fingerprinting robust to whitespace layout:
    * h = (h*31 + u32(xxhash64(token))) masked to 48 bits each step, so
    * the arithmetic never overflows a long (ANSI mode throws on wrap).
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) =>
      (acc * lit(31L) + xxhash64(w).bitwiseAND(lit(0xffffffffL)))
        .bitwiseAND(lit(0xffffffffffffL)))
}
