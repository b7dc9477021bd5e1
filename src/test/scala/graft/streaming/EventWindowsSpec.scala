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

  test("sliding windows count each event in multiple windows") {
    val session = spark
    import session.implicits._
    val batch = Seq(Ev(t("2024-01-01 00:05:00"), "click", 1.0, 1L)).toDF()
    val rows = EventWindows.slidingUserCounts(batch, "10 minutes", "5 minutes").collect()
    assert(rows.length == 2) // 00:00-00:10 and 00:05-00:15
  }
}
