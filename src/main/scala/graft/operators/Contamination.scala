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

  /** Corpus rows with NO contaminated pairing — the decontaminated set. */
  def decontaminated(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int,
      minShared: Long): DataFrame =
    corpus.join(
      ngramOverlap(corpus, benchmark, idCol, textCol, shingleN, minShared)
        .select(col("corpus_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
