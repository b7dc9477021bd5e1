package graft.serving

import org.scalatest.funsuite.AnyFunSuite

class AnalysisCacheSpec extends AnyFunSuite {

  test("memoizes within TTL, recomputes after expiry (reference semantics)") {
    var now = 0L
    val cache = new AnalysisCache[Int](ttlMillis = 1000, clock = () => now)
    var computes = 0
    def f = { computes += 1; 42 }
    assert(cache.getOrCompute("loyalty:10:30:")(f) == 42)
    assert(cache.getOrCompute("loyalty:10:30:")(f) == 42)
    assert(computes == 1)
    now = 1500
    assert(cache.getOrCompute("loyalty:10:30:")(f) == 42)
    assert(computes == 2)
  }

  test("prefix invalidation drops only matching keys") {
    val cache = new AnalysisCache[Int]()
    cache.getOrCompute("loyalty:10:a")(1)
    cache.getOrCompute("loyalty:9:b")(2)
    cache.getOrCompute("attendance:10:c")(3)
    assert(cache.invalidatePrefix("loyalty:") == 2)
    assert(cache.get("loyalty:10:a").isEmpty)
    assert(cache.get("attendance:10:c").contains(3))
  }
}
