package graft.serving

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Fixed-window request rate limiter (reference `rate_limit.py` /
  * slowapi's "60/minute" semantics): at most `limit` requests per key per
  * window. Keys are `route:client`, so one hot client can't starve the
  * others. O(1) per request; stale windows are replaced in place, so the
  * map never grows beyond the live key set.
  */
class RateLimiter(windowMillis: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private final class Window(val startedAt: Long) {
    val count = new AtomicLong(0)
  }
  private val windows = new ConcurrentHashMap[String, Window]()

  /** Record one request; true = allowed, false = over the limit. */
  def allow(key: String, limit: Int): Boolean = {
    val now = clock()
    val w = windows.compute(key, (_, cur) =>
      if (cur == null || now - cur.startedAt >= windowMillis) new Window(now)
      else cur)
    w.count.incrementAndGet() <= limit
  }
}
