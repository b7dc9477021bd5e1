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
}
