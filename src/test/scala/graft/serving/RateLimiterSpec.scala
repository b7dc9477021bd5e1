package graft.serving

import org.scalatest.funsuite.AnyFunSuite

/** Fixed-window limiter semantics + the stale-window sweep (the map must
  * not retain one entry per distinct client forever).
  */
class RateLimiterSpec extends AnyFunSuite {

  private class ManualClock(var now: Long = 0L) extends (() => Long) {
    override def apply(): Long = now
  }

  test("allows up to the limit per window, then refuses; a new window " +
      "resets the key") {
    val clock = new ManualClock()
    val rl = new RateLimiter(windowMillis = 1000L, clock = clock)
    assert((1 to 3).forall(_ => rl.allow("r:a", 3)))
    assert(!rl.allow("r:a", 3))
    // other keys are unaffected
    assert(rl.allow("r:b", 3))
    clock.now = 1000L
    assert(rl.allow("r:a", 3))
  }

  test("stale windows are swept: keys that never return are dropped " +
      "instead of accumulating forever") {
    val clock = new ManualClock()
    val rl = new RateLimiter(windowMillis = 1000L, clock = clock)
    (1 to 100).foreach(i => rl.allow(s"r:client$i", 60))
    assert(rl.trackedKeys == 100)
    // two windows later a single request triggers the sweep; only the
    // live key remains
    clock.now = 2500L
    rl.allow("r:fresh", 60)
    assert(rl.trackedKeys == 1)
    // the sweep runs at most once per window (the fresh key survives a
    // same-window call)
    rl.allow("r:fresh2", 60)
    assert(rl.trackedKeys == 2)
  }
}
