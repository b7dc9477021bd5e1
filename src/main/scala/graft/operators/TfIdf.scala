package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF scoring over a text corpus — the workhorse relevance/keyword
  * feature for training-data curation. Pure relational formulation:
  * explode → term frequencies (one shuffle on (doc, term)) → document
  * frequencies (one shuffle on term, broadcast back) → score. No
  * vocabulary collection on the driver; scales with the corpus.
  */
object TfIdf {

  /** Per-(doc, term) tf-idf: tf * ln(N / df). */
  def scores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    val tf = words.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df_cnt"))
    // N computed in-query (countDistinct excludes NULL ids, matching the
    // oracle's count(DISTINCT ...)) — no eager driver-side count, plan
    // construction stays lazy and single-pass
    val nDf = df.agg(countDistinct(col(idCol)).cast("double").as("__n"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDf))
      .withColumn("idf", log(col("__n") / col("df_cnt").cast("double")))
      .withColumn("tfidf", col("tf").cast("double") * col("idf"))
      .drop("__n")
  }

  /** Top-k characteristic terms per document (score desc, term asc). */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scores(df, idCol, textCol)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rn") <= k)
  }

  /** BM25 top-k retrieval (Robertson-Spärck Jones, the Lucene
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf variant that never goes
    * negative) — the standard lexical-retrieval scorer a pipeline runs
    * for decontamination probes and targeted data selection. Each query
    * is a bag of DISTINCT whitespace terms; per matched (query, doc,
    * term):
    *
    *   idf(t) · (tf · (k1+1)) / (tf + k1 · (1 − b + b · dl/avgdl))
    *
    * Per-term contributions are cast to DECIMAL(20,12) before the sum,
    * so the per-doc score is summation-ORDER-FREE — partial aggregation
    * over any partitioning yields the identical decimal, and the top-k
    * ranking (score desc, id asc) cannot flip between engines on a
    * last-ulp fold difference. The rounded double is re-derived from
    * that decimal only for display.
    *
    * Plan shape at 100 TB: the query-term table is a driver literal
    * (broadcast), so `tf` collapses to query-matched terms BEFORE the
    * df/dl joins — document frequencies and lengths are the only
    * corpus-wide aggregates (one shuffle each on term/id), and the
    * final ranking windows over |queries|·|matched docs| rows, not the
    * corpus.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(k > 0, s"k=$k must be positive")
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    val session = df.sparkSession
    import session.implicits._
    val qtermRows = queries.flatMap { case (qid, qtext) =>
      qtext.toLowerCase.split(" ").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    require(qtermRows.nonEmpty, "queries tokenized to nothing")
    val qterms = qtermRows.toDF("query_id", "term")
    val words = df.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    val tf = words.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // collapse to query-matched terms FIRST (broadcast) — df/dl joins
    // and the window below never see the full vocabulary
    val tfq = tf.join(broadcast(qterms), Seq("term"))
    val dfCnt = tfq.groupBy(col("term"), col("query_id"))
      .agg(count(lit(1)).as("df_cnt"))
    val dl = words.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = df.agg(
        countDistinct(col(idCol)).cast("double").as("__n"),
        sum(size(TextAnalysis.tokens(lower(col(textCol)))))
          .cast("double").as("__tok"))
      .select(col("__n"), (col("__tok") / col("__n")).as("__avgdl"))
    // the exact parenthesization below is the cross-engine contract —
    // every step is a correctly-rounded IEEE op on identical inputs
    // (ln is the one libm call; the 6-decimal display round absorbs it)
    val idf = log(lit(1.0) +
      (col("__n") - col("df_cnt").cast("double") + lit(0.5)) /
        (col("df_cnt").cast("double") + lit(0.5)))
    val norm = lit(k1) * (lit(1.0 - b) +
      lit(b) * (col("dl").cast("double") / col("__avgdl")))
    val contrib = ((idf * (col("tf").cast("double") * lit(k1 + 1))) /
      (col("tf").cast("double") + norm)).cast(DecimalType(20, 12))
    val scored = tfq
      .join(dfCnt, Seq("term", "query_id"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__c", contrib)
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("n_terms"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__s").desc, col(idCol).asc)))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col(idCol), col("n_terms"),
        round(col("__s").cast("double"), 6).as("score"))
  }
}
