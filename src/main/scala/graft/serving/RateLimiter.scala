package graft.serving

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Fixed-window request rate limiter (reference `rate_limit.py` /
  * slowapi's "60/minute" semantics): at most `limit` requests per key per
  * window. Keys are `route:client`, so one hot client can't starve the
  * others. O(1) per request; a stale window is replaced in place on its
  * key's next request, and once per window a sweep drops the windows of
  * keys that never came back — without it the map grows by one entry per
  * distinct client IP ever seen, forever.
  */
class RateLimiter(windowMillis: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private final class Window(val startedAt: Long) {
    val count = new AtomicLong(0)
  }
  private val windows = new ConcurrentHashMap[String, Window]()
  private val lastSweep = new AtomicLong(Long.MinValue)

  /** Record one request; true = allowed, false = over the limit. */
  def allow(key: String, limit: Int): Boolean = {
    val now = clock()
    sweep(now)
    val w = windows.compute(key, (_, cur) =>
      if (cur == null || now - cur.startedAt >= windowMillis) new Window(now)
      else cur)
    w.count.incrementAndGet() <= limit
  }

  /** At most one full pass per window; the CAS makes concurrent callers
    * race to a single sweeper, everyone else proceeds.
    */
  private def sweep(now: Long): Unit = {
    val last = lastSweep.get()
    if ((last == Long.MinValue || now - last >= windowMillis) &&
        lastSweep.compareAndSet(last, now)) {
      val it = windows.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        // Value-conditional remove: between our staleness check and the
        // removal, allow() may install a FRESH window for this key; plain
        // it.remove() would delete it regardless of value and lose its
        // counted requests.
        if (now - e.getValue.startedAt >= windowMillis)
          windows.remove(e.getKey, e.getValue)
      }
    }
  }

  /** Live entry count (test observability). */
  private[serving] def trackedKeys: Int = windows.size()
}
