package graft.serving

import java.util.concurrent.{Executors, ThreadFactory, TimeUnit}

/** Daily data-refresh scheduler (reference
  * `services/daily_refresh_service.py`, enabled/hour from
  * `config.py:133-134`): once a day at a fixed CET hour, re-run the
  * refresh action (re-download → reload → invalidate serving caches) on
  * a background thread. The reference uses a pure-asyncio sleep loop; the
  * JVM analog is one daemon scheduler thread — no external scheduler
  * dependency either way.
  *
  * The refresh action itself is injected: production wires
  * Downloader.downloadPeriod(force = true) → PeriodLoader.load → a
  * catalog swap + GraftServer.invalidatePeriod; tests wire a latch. A
  * refresh that throws is logged and the schedule continues (the
  * reference logs and keeps its loop alive too).
  */
class DailyRefresh(
    refresh: () => Unit,
    targetHourCet: Int = sys.env.getOrElse("GRAFT_REFRESH_HOUR", "3").toInt,
    enabled: Boolean = sys.env.getOrElse("GRAFT_REFRESH_ENABLED", "1") == "1",
    clock: () => Long = () => System.currentTimeMillis()) {

  require(targetHourCet >= 0 && targetHourCet < 24,
    s"refresh hour $targetHourCet outside [0, 24)")

  private val exec = Executors.newSingleThreadScheduledExecutor(
    new ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "graft-daily-refresh")
        t.setDaemon(true)
        t
      }
    })

  @volatile private var refreshCount = 0L
  def refreshes: Long = refreshCount

  /** Start the schedule; returns this. No-op when disabled. */
  def start(): DailyRefresh = {
    if (enabled) scheduleNext()
    this
  }

  private def scheduleNext(): Unit =
    exec.schedule(new Runnable {
      override def run(): Unit = {
        // scheduleNext in finally: an Error (OOM, LinkageError) escaping
        // refresh() must not silently kill the daily chain forever.
        try { refresh(); refreshCount += 1 }
        catch { case e: Throwable =>
          System.err.println(s"[daily-refresh] failed: ${e.getMessage}")
          if (!scala.util.control.NonFatal(e)) throw e
        }
        finally scheduleNext()
      }
    }, DailyRefresh.secondsUntilNextRun(targetHourCet, clock()), TimeUnit.SECONDS)

  def stop(): Unit = exec.shutdownNow()
}

object DailyRefresh {

  /** CET is modeled as fixed UTC+1 like the reference (`_CET_OFFSET_HOURS`
    * — DST shifts a 3 AM maintenance task by an hour, which it accepts).
    */
  private val CetOffsetHours = 1

  /** Seconds until the next occurrence of `targetHour` CET, given epoch
    * millis `nowMillis`; always in (0, 86400].
    */
  def secondsUntilNextRun(targetHour: Int, nowMillis: Long): Long = {
    val secondsIntoUtcDay = math.floorMod(nowMillis / 1000L, 86400L)
    val secondsIntoCetDay =
      (secondsIntoUtcDay + CetOffsetHours * 3600L) % 86400L
    val target = targetHour * 3600L
    val diff = target - secondsIntoCetDay
    if (diff <= 0) diff + 86400L else diff
  }
}
