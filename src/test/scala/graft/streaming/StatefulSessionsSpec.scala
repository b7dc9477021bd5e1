package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StatefulSessions._

class StatefulSessionsSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("sessions close on gap timeout; one record per closed session") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then 40-min gap
      mem.addData(
        Event(1L, t("2024-01-01 10:00:00"), "click"),
        Event(1L, t("2024-01-01 10:05:00"), "view"))
      q.processAllAvailable()
      // advance event time far enough to fire timeout + pass watermark
      mem.addData(Event(2L, t("2024-01-01 13:00:00"), "click"))
      q.processAllAvailable()
      mem.addData(Event(2L, t("2024-01-01 15:00:00"), "click"))
      q.processAllAvailable()
      val out = session.sql("SELECT * FROM sessions").as[ClosedSession].collect()
      val u1 = out.filter(_.user_id == 1L)
      assert(u1.length == 1)
      assert(u1.head.n_events == 2L)
      assert(u1.head.session_start == t("2024-01-01 10:00:00"))
      assert(u1.head.session_end == t("2024-01-01 10:05:00"))
    } finally q.stop()
  }

  test("in-batch gap splits into multiple sessions") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(5L, t("2024-01-01 09:00:00"), "a"),
        Event(5L, t("2024-01-01 10:00:00"), "b"), // 60-min gap -> closes first
        Event(5L, t("2024-01-01 10:10:00"), "c"))
      q.processAllAvailable()
      val out = session.sql("SELECT * FROM sessions2").as[ClosedSession].collect()
      assert(out.length == 1) // first session closed in-batch; second still open
      assert(out.head.n_events == 1L)
    } finally q.stop()
  }
}
