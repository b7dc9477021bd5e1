package graft.psp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Topic-classification pipeline for parliamentary prints (reference
  * `services/tisk/classifier.py:18-360`): the CLASSIFICATION itself is an
  * LLM call and stays behind [[TopicPipeline.Classifier]] (stub policy,
  * like the other external-enrichment stages); what this ports is the
  * pipeline semantics around it —
  *
  *  - incremental resume: already-classified prints are not re-sent;
  *    prints with topics but no summary are re-processed (the
  *    reference's "smart caching", py:44-55),
  *  - checkpointing to parquet (per processed batch here — the
  *    reference saves after every print because its loop is
  *    driver-side; a Spark pass checkpoints per run, documented
  *    divergence),
  *  - topic consolidation: apply a label mapping with order-preserving
  *    dedup (py:299-308), skipped when ≤ 10 unique labels (py:240-248),
  *  - the (ct → topics) map the law browser's topic filter consumes —
  *    here a DataFrame, joinable instead of a driver dict.
  *
  * Topics are native array<string> columns (the reference stores a
  * JSON-in-string shim; Spark-first keeps the natural type — the law
  * browser's `array_contains` filter reads it directly).
  */
object TopicPipeline {

  /** The LLM boundary: bilingual classify+summarize for one print, and
    * the label-consolidation mapping. Production wires a real client;
    * tests wire deterministic fixtures.
    */
  trait Classifier {
    def available: Boolean
    /** (topics, topics_en, summary, summary_en) for one print's text. */
    def classifyAndSummarize(ct: Long, text: String): (Seq[String], Seq[String], String, String)
    /** Summaries only — the topics-present/summary-missing resume path. */
    def summarize(ct: Long, text: String): (String, String)
    /** old label → consolidated label, both languages. */
    def consolidate(topicsCs: Seq[String], topicsEn: Seq[String])
        : (Map[String, String], Map[String, String])
  }

  val RecordSchema: StructType = StructType(Seq(
    StructField("ct", LongType),
    StructField("topic", ArrayType(StringType)),
    StructField("topic_en", ArrayType(StringType)),
    StructField("summary", StringType),
    StructField("summary_en", StringType),
    StructField("source", StringType)))

  private def emptyRecords(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], RecordSchema)

  /** Load the checkpoint parquet (empty relation when absent). */
  def loadRecords(spark: SparkSession, parquetPath: String): DataFrame =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(parquetPath)))
      spark.read.parquet(parquetPath)
    else emptyRecords(spark)

  /** Resume-aware classification pass: `texts` rows are (ct, text);
    * returns the full record set (kept ∪ newly classified) and writes it
    * to `parquetPath`. With an unavailable classifier, returns the
    * cached records untouched (py:80-86).
    */
  def classifyAndSave(
      spark: SparkSession, texts: DataFrame, parquetPath: String,
      classifier: Classifier): DataFrame = {
    val existing = loadRecords(spark, parquetPath)
    if (!classifier.available) return existing

    val done = existing
      .filter(size(col("topic")) > 0 && col("summary") =!= "")
    val incomplete = existing
      .filter(size(col("topic")) > 0 && col("summary") === "")
      .select(col("ct"), col("topic"), col("topic_en"), col("source"))

    // new prints: no record at all; incomplete prints: summaries only
    val fresh = texts.join(existing.select("ct"), Seq("ct"), "left_anti")
    val needsSummary = texts.join(incomplete, Seq("ct"))

    val cls = classifier
    import spark.implicits._
    val freshRecords = fresh.select(col("ct").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (ct, text) =>
        val (t, tEn, s, sEn) = cls.classifyAndSummarize(ct, text)
        (ct, t, tEn, s, sEn, if (t.nonEmpty) "llm" else "unclassified")
      }
      .toDF("ct", "topic", "topic_en", "summary", "summary_en", "source")
    val summarized = needsSummary
      .select(col("ct").cast("long"), col("text"), col("topic"),
        col("topic_en"), col("source"))
      .as[(Long, String, Seq[String], Seq[String], String)]
      .map { case (ct, text, t, tEn, source) =>
        val (s, sEn) = cls.summarize(ct, text)
        (ct, t, tEn, s, sEn, source)
      }
      .toDF("ct", "topic", "topic_en", "summary", "summary_en", "source")

    val all = done.unionByName(freshRecords).unionByName(summarized)
    writeCheckpoint(all, parquetPath)
    loadRecords(spark, parquetPath)
  }

  /** Consolidate topic labels across records (py:220-296): collect the
    * unique label sets, skip when both are ≤ 10, otherwise ask the
    * classifier for a mapping and apply it with order-preserving dedup.
    */
  def consolidateTopics(
      spark: SparkSession, parquetPath: String, classifier: Classifier): DataFrame = {
    val records = loadRecords(spark, parquetPath)
    val uniqueCs = records.select(explode(col("topic"))).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val uniqueEn = records.select(explode(col("topic_en"))).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    if ((uniqueCs.length <= 10 && uniqueEn.length <= 10) || !classifier.available)
      return records
    val (mapCs, mapEn) = classifier.consolidate(uniqueCs, uniqueEn)
    val out = records
      .withColumn("topic", applyMapping(col("topic"), mapCs))
      .withColumn("topic_en", applyMapping(col("topic_en"), mapEn))
    writeCheckpoint(out, parquetPath)
    loadRecords(spark, parquetPath)
  }

  /** mapping.getOrElse per element + first-occurrence dedup
    * (py:299-308) as pure array expressions.
    */
  private[psp] def applyMapping(
      topics: org.apache.spark.sql.Column, mapping: Map[String, String])
      : org.apache.spark.sql.Column =
    if (mapping.isEmpty) topics
    else {
      val m = map(mapping.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      array_distinct(transform(topics, t => coalesce(element_at(m, t), t)))
    }

  /** (ct, topics) rows with non-empty topics — the law browser's topic
    * filter input (py:313-338's topic_map as a relation).
    */
  def topicMap(records: DataFrame): DataFrame =
    records.filter(size(col("topic")) > 0).select("ct", "topic")

  private def writeCheckpoint(df: DataFrame, path: String): Unit = {
    // overwrite-in-place would drop source files mid-read; stage + swap
    val tmp = path + ".tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val old = java.nio.file.Paths.get(path + ".old")
      deleteRecursively(old)
      java.nio.file.Files.move(p, old)
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), p)
      deleteRecursively(old)
    } else java.nio.file.Files.move(java.nio.file.Paths.get(tmp), p)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
}
