package graft.psp

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pipeline-semantics tests for the topic classifier harness (reference
  * `tests` around `services/tisk/classifier.py`): resume, smart
  * re-processing of summary-less records, checkpoint durability,
  * consolidation mapping with order-preserving dedup, and the ≤10-label
  * skip — all with a deterministic fixture classifier (LLM stub policy).
  */
object TopicPipelineSpec {
  // top-level: the classifier ships to executors, so it must not capture
  // the (non-serializable) suite instance
  object CallCounter extends Serializable {
    val classifies = new AtomicInteger(0)
    val summarizes = new AtomicInteger(0)
  }

  class FixtureClassifier(
      mappingCs: Map[String, String] = Map.empty)
      extends TopicPipeline.Classifier with Serializable {
    override def available: Boolean = true
    override def classifyAndSummarize(ct: Long, text: String) = {
      CallCounter.classifies.incrementAndGet()
      (Seq(s"topic-$ct"), Seq(s"topic-en-$ct"), s"sum-$ct", s"sum-en-$ct")
    }
    override def summarize(ct: Long, text: String) = {
      CallCounter.summarizes.incrementAndGet()
      (s"late-sum-$ct", s"late-sum-en-$ct")
    }
    override def consolidate(cs: Seq[String], en: Seq[String]) =
      (mappingCs, Map.empty[String, String])
  }
}

class TopicPipelineSpec extends SparkSpec {
  import TopicPipelineSpec._

  private def texts(cts: Long*) = {
    import spark.implicits._
    cts.map(ct => (ct, s"text of print $ct")).toDF("ct", "text")
  }

  test("fresh run classifies everything and checkpoints to parquet") {
    val path = Files.createTempDirectory("topics").resolve("t.parquet").toString
    val out = TopicPipeline.classifyAndSave(
      spark, texts(1, 2, 3), path, new FixtureClassifier())
    assert(out.count() == 3)
    val r1 = out.filter(col("ct") === 1).collect()(0)
    assert(r1.getAs[scala.collection.Seq[String]]("topic") == Seq("topic-1"))
    assert(r1.getAs[String]("summary") == "sum-1")
    // checkpoint survives a fresh read
    assert(spark.read.parquet(path).count() == 3)
  }

  test("resume: complete records are NOT re-sent; summary-less records " +
      "get summaries only; new records classify (smart caching)") {
    import spark.implicits._
    val path = Files.createTempDirectory("topics").resolve("t.parquet").toString
    // pre-seed: ct=1 complete, ct=2 has topics but no summary
    Seq(
      (1L, Seq("old-1"), Seq("old-en-1"), "old-sum-1", "old-sum-en-1", "llm"),
      (2L, Seq("old-2"), Seq("old-en-2"), "", "", "llm"))
      .toDF("ct", "topic", "topic_en", "summary", "summary_en", "source")
      .write.parquet(path)

    CallCounter.classifies.set(0)
    CallCounter.summarizes.set(0)
    val out = TopicPipeline.classifyAndSave(
      spark, texts(1, 2, 3), path, new FixtureClassifier())
    assert(CallCounter.classifies.get() == 1, "only ct=3 is new")
    assert(CallCounter.summarizes.get() == 1, "only ct=2 needs a summary")
    val byCt = out.collect().map(r => r.getAs[Long]("ct") -> r).toMap
    assert(byCt(1).getAs[String]("summary") == "old-sum-1")
    assert(byCt(2).getAs[scala.collection.Seq[String]]("topic") == Seq("old-2"),
      "resumed record keeps its cached topics")
    assert(byCt(2).getAs[String]("summary") == "late-sum-2")
    assert(byCt(3).getAs[String]("summary") == "sum-3")
  }

  test("unavailable classifier returns the cache untouched") {
    val path = Files.createTempDirectory("topics").resolve("t.parquet").toString
    val off = new TopicPipeline.Classifier with Serializable {
      override def available = false
      override def classifyAndSummarize(ct: Long, text: String) =
        throw new IllegalStateException("must not be called")
      override def summarize(ct: Long, text: String) =
        throw new IllegalStateException("must not be called")
      override def consolidate(cs: Seq[String], en: Seq[String]) =
        (Map.empty[String, String], Map.empty[String, String])
    }
    val out = TopicPipeline.classifyAndSave(spark, texts(1, 2), path, off)
    assert(out.count() == 0)
  }

  test("consolidation applies the mapping with order-preserving dedup; " +
      "<= 10 unique labels skips it") {
    import spark.implicits._
    val path = Files.createTempDirectory("topics").resolve("t.parquet").toString
    // 11 unique CS labels so consolidation engages; daň/daně merge
    val rows = (1L to 9L).map(ct =>
      (ct, Seq(s"u$ct"), Seq.empty[String], "s", "s", "llm")) :+
      (10L, Seq("daň", "daně", "školství"), Seq.empty[String], "s", "s", "llm")
    rows.toDF("ct", "topic", "topic_en", "summary", "summary_en", "source")
      .write.parquet(path)
    val merged = TopicPipeline.consolidateTopics(spark, path,
      new FixtureClassifier(mappingCs = Map("daně" -> "daň")))
    val t10 = merged.filter(col("ct") === 10).collect()(0)
      .getAs[scala.collection.Seq[String]]("topic")
    assert(t10 == Seq("daň", "školství"), s"got $t10")

    // few labels: untouched even with a destructive mapping
    val path2 = Files.createTempDirectory("topics").resolve("t2.parquet").toString
    Seq((1L, Seq("a", "b"), Seq.empty[String], "s", "s", "llm"))
      .toDF("ct", "topic", "topic_en", "summary", "summary_en", "source")
      .write.parquet(path2)
    val kept = TopicPipeline.consolidateTopics(spark, path2,
      new FixtureClassifier(mappingCs = Map("a" -> "ZZZ")))
    assert(kept.collect()(0).getAs[scala.collection.Seq[String]]("topic") ==
      Seq("a", "b"))
  }

  test("topicMap feeds the law browser's topic filter as a relation") {
    import spark.implicits._
    val records = Seq(
      (100L, Seq("finance"), Seq.empty[String], "s", "s", "llm"),
      (101L, Seq.empty[String], Seq.empty[String], "", "", "unclassified"))
      .toDF("ct", "topic", "topic_en", "summary", "summary_en", "source")
    val tm = TopicPipeline.topicMap(records)
    assert(tm.collect().map(_.getAs[Long]("ct")).toSeq == Seq(100L))
    // join shape: laws enriched with pipeline topics, filterable
    val laws = Seq((410L, 100L, "Návrh zákona o rozpočtu", "in_progress"))
      .toDF("id_tisk", "ct", "nazev", "status")
    val enriched = laws.join(tm, Seq("ct"), "left")
      .withColumn("topics", coalesce(col("topic"), array()))
    assert(LawsBrowser.listLaws(enriched, topicFilter = Some("finance")).count() == 1)
    assert(LawsBrowser.listLaws(enriched, topicFilter = Some("space")).count() == 0)
  }
}
