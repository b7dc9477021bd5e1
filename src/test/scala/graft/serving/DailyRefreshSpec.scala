package graft.serving

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** Schedule math + loop behavior of the daily refresh
  * (`daily_refresh_service.py` parity).
  */
class DailyRefreshSpec extends AnyFunSuite {

  test("secondsUntilNextRun targets the CET hour, wrapping to the next " +
      "day when it already passed") {
    // epoch 0 = midnight UTC = 01:00 CET
    assert(DailyRefresh.secondsUntilNextRun(3, 0L) == 2 * 3600L)
    // exactly at the target hour -> a full day ahead, never 0
    assert(DailyRefresh.secondsUntilNextRun(3, 2 * 3600L * 1000) == 86400L)
    // one second past the target -> 86399
    assert(DailyRefresh.secondsUntilNextRun(3, (2 * 3600L + 1) * 1000) == 86399L)
    // target earlier in the CET day than now -> tomorrow
    assert(DailyRefresh.secondsUntilNextRun(0, 3600L * 1000) == 22 * 3600L)
    assert((0 until 24).forall { h =>
      val s = DailyRefresh.secondsUntilNextRun(h, 123456789L)
      s > 0 && s <= 86400
    })
  }

  test("the loop runs the refresh, survives a throwing refresh, and " +
      "keeps scheduling") {
    val ran = new CountDownLatch(3)
    // a clock pinned one second before the target hour makes the
    // schedule fire ~immediately, every time
    val clock = () => (2 * 3600L - 1) * 1000
    var first = true
    val svc = new DailyRefresh(
      refresh = () => {
        ran.countDown()
        if (first) { first = false; throw new RuntimeException("transient") }
      },
      targetHourCet = 3, enabled = true, clock = clock)
    try {
      svc.start()
      assert(ran.await(30, TimeUnit.SECONDS), "refresh loop did not fire 3 times")
      // the throwing first run is not counted as a success
      assert(svc.refreshes >= 1)
    } finally svc.stop()
  }

  test("disabled mode never schedules") {
    val svc = new DailyRefresh(() => fail("must not run"),
      targetHourCet = 3, enabled = false,
      clock = () => (2 * 3600L - 1) * 1000)
    try {
      svc.start()
      Thread.sleep(1500)
      assert(svc.refreshes == 0)
    } finally svc.stop()
  }
}
