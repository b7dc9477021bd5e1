package graft.serving

import java.util.concurrent.ConcurrentHashMap

/** Serving-layer result memoization (reference
  * `services/analysis_cache.py:11-48`): TTL'd, thread-safe, with prefix
  * invalidation — keys look like `loyalty:{period}:{top}:{party}`.
  * Orthogonal to Spark (caches COLLECTED results, not plans); the Spark
  * analog for hot inputs is `df.persist`, used separately.
  */
class AnalysisCache[V](ttlMillis: Long = 3600L * 1000,
    clock: () => Long = () => System.currentTimeMillis(),
    maxEntries: Int = 10000) {

  private case class Entry(value: V, at: Long)
  private val store = new ConcurrentHashMap[String, Entry]()

  def getOrCompute(key: String)(compute: => V): V = {
    val now = clock()
    val hit = store.get(key)
    if (hit != null && now - hit.at < ttlMillis) hit.value
    else {
      val v = compute
      store.put(key, Entry(v, now))
      if (store.size() > maxEntries) evict(now)
      v
    }
  }

  /** Entry-count bound: every distinct param combination is a key, so an
    * unbounded map is a slow memory leak under adversarial query
    * diversity. Over the cap: drop expired entries first, then the
    * oldest until within bound (oldest-inserted ≈ least recently
    * computed under a TTL'd read-through cache).
    */
  private def evict(now: Long): Unit = {
    store.entrySet().removeIf(e => now - e.getValue.at >= ttlMillis)
    val over = store.size() - maxEntries
    if (over > 0) {
      import scala.jdk.CollectionConverters._
      store.entrySet().asScala.toSeq
        .sortBy(_.getValue.at)
        .take(over)
        .foreach(e => store.remove(e.getKey))
    }
  }

  def get(key: String): Option[V] = {
    val now = clock()
    Option(store.get(key)).filter(e => now - e.at < ttlMillis).map(_.value)
  }

  /** Invalidate every key starting with `prefix` (reference semantics:
    * a data refresh drops `loyalty:` etc. wholesale).
    */
  def invalidatePrefix(prefix: String): Int = {
    var n = 0
    val it = store.keySet().iterator()
    while (it.hasNext) {
      if (it.next().startsWith(prefix)) { it.remove(); n += 1 }
    }
    n
  }

  def size: Int = store.size()
}
