package graft

import org.apache.spark.sql.DataFrame

/** Per-(session, dir) cached-DataFrame registry shared by the query
  * tiers that reuse expensive frames across driver queries (dedup
  * shingles/pairs, graph edges, PQ model frames).
  *
  * get-then-putIfAbsent rather than computeIfAbsent: builders nest
  * (one cached frame may be built inside another's builder), and
  * ConcurrentHashMap throws "Recursive update" on reentrant
  * computeIfAbsent. The losing side of a putIfAbsent race unpersists
  * its duplicate. Callers expose their own `clearCaches()` delegating
  * to [[clear]] so the harness epilogue can release storage.
  */
final class FrameRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Session+dir-scoped lookup — the scoping lives HERE so no call
    * site can forget the session component and leak one session's
    * cached plan into another. Keyed on `sessionUUID` (stable and
    * unique per session), not identityHashCode: a hash can alias after
    * the session is GC'd, handing out a cached frame bound to a dead
    * session. */
  def cached(s: org.apache.spark.sql.SparkSession, d: String, name: String)
      (build: => DataFrame): DataFrame =
    cached(s"$name|${sessionKey(s)}|$d")(build)

  /** `sessionUUID` is `private[sql]`; the Bridge exposes it (with an
    * identity-hash fallback for non-classic sessions). */
  private def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    org.apache.spark.sql.graft.Bridge.sessionUUID(s)

  def cached(key: String)(build: => DataFrame): DataFrame = {
    val existing = cache.get(key)
    if (existing != null) existing
    else {
      val df = build.cache()
      val prev = cache.putIfAbsent(key, df)
      if (prev != null) { df.unpersist(); prev } else df
    }
  }

  def clear(): Unit = {
    cache.values.forEach(df => { df.unpersist(); () })
    cache.clear()
  }

  /** Drop (and unpersist) only the entries whose key starts with
    * `prefix` — the targeted clear a bench warm's rebuild cycle needs
    * so re-timing one cached frame can never evict another registry
    * entry that was already measured. */
  def drop(prefix: String): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) { e.getValue.unpersist(); it.remove() }
    }
  }
}
