package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

class EventWindowsSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("tumbling window counts over a real stream (watermark + append)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventWindows.tumblingCounts(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("tumble")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(t("2024-01-01 00:01:00"), "click", 1.0, 1L),
        Ev(t("2024-01-01 00:02:00"), "click", 2.0, 2L),
        Ev(t("2024-01-01 00:11:00"), "view", 3.0, 1L))
      q.processAllAvailable()
      // advance watermark far enough to close the first two windows
      mem.addData(Ev(t("2024-01-01 01:00:00"), "click", 1.0, 3L))
      q.processAllAvailable()
      val out = session.sql("SELECT * FROM tumble").collect()
      val clicks = out.find(r => r.getAs[String]("event_type") == "click" &&
        r.getAs[Timestamp]("window_start") == t("2024-01-01 00:00:00"))
      assert(clicks.isDefined)
      assert(clicks.get.getAs[Long]("n") == 2L)
      assert(clicks.get.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("batch and streaming share the same transform (batch run)") {
    val session = spark
    import session.implicits._
    val batch = Seq(
      Ev(t("2024-01-01 00:01:00"), "click", 1.0, 1L),
      Ev(t("2024-01-01 00:02:00"), "click", 2.0, 2L)).toDF()
    val rows = EventWindows.tumblingCounts(batch, "10 minutes").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n") == 2L)
  }

  test("streaming dedup emits each key once, state bounded by watermark") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventWindows.dedupWithinWatermark(
        mem.toDF(), "ts", "10 minutes", Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(t("2024-01-01 00:01:00"), "click", 1.0, 1L),
        Ev(t("2024-01-01 00:02:00"), "click", 2.0, 1L), // dup key within wm
        Ev(t("2024-01-01 00:03:00"), "view", 3.0, 1L))
      q.processAllAvailable()
      val out = session.sql("SELECT event_type, count(*) n FROM dedup GROUP BY 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("click" -> 1L, "view" -> 1L))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to a prior signup only") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val clicks = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val joined = EventWindows.intervalJoin(
      clicks.toDF().select(col("user_id"), col("ts"), col("value")),
      signups.toDF().select(col("user_id"), col("ts").as("signup_ts")),
      "user_id", "ts", "signup_ts", "30 minutes", "10 minutes")
    val q = joined
      .select(col("l.user_id"), col("ts"), col("signup_ts"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      signups.addData(Ev(t("2024-01-01 00:05:00"), "signup", 0.0, 1L))
      clicks.addData(
        Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1L), // 5 min after signup -> match
        Ev(t("2024-01-01 00:01:00"), "click", 1.0, 1L), // BEFORE signup -> no match
        Ev(t("2024-01-01 00:10:00"), "click", 1.0, 2L)) // other user -> no match
      q.processAllAvailable()
      val out = session.sql("SELECT * FROM attrib").collect()
      assert(out.length == 1)
      assert(out(0).getAs[Long]("user_id") == 1L)
      assert(out(0).getAs[Timestamp]("ts") == t("2024-01-01 00:10:00"))
    } finally q.stop()
  }

  test("sliding windows count each event in multiple windows") {
    val session = spark
    import session.implicits._
    val batch = Seq(Ev(t("2024-01-01 00:05:00"), "click", 1.0, 1L)).toDF()
    val rows = EventWindows.slidingUserCounts(batch, "10 minutes", "5 minutes").collect()
    assert(rows.length == 2) // 00:00-00:10 and 00:05-00:15
  }

  test("chunkTokens composes into a stream unchanged (stateless per-row " +
      "generation is streaming-safe)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val mem = MemoryStream[(Long, String)]
    val chunked = graft.operators.Packing.chunkTokens(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", 4, 1)
    val q = chunked.writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    try {
      mem.addData((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b"))
      q.processAllAvailable()
      val rows = session.sql("SELECT * FROM chunks").collect()
      assert(rows.length == 4) // 3 chunks for doc 1, 1 for doc 2
      assert(rows.map(_.getAs[String]("chunk_text")).contains("t3 t4 t5 t6"))
    } finally q.stop()
  }

  test("canonical-URL streaming dedup: crawl ingestion dedupes on the " +
      "normalized key with watermark-bounded state") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val withKey = mem.toDF().toDF("ts", "url")
      .withColumn("curl", graft.functions.UrlNorm.canonicalUrl(col("url")))
    val q = EventWindows.dedupWithinWatermark(
        withKey, "ts", "10 minutes", Seq("curl"))
      .writeStream.format("memory").queryName("urldedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (t("2024-01-01 00:01:00"), "https://Example.COM/a/?utm_source=x"),
        (t("2024-01-01 00:02:00"), "https://example.com:443/a"), // same canon
        (t("2024-01-01 00:03:00"), "https://example.com/b"))
      q.processAllAvailable()
      val urls = session.sql("SELECT curl FROM urldedup")
        .collect().map(_.getString(0)).sorted
      assert(urls.toSeq == Seq("https://example.com/a", "https://example.com/b"))
    } finally q.stop()
  }
}
