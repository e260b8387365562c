package graft.functions

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** TTL result cache — the engine-side analog of the reference's Redis
  * layer (reference `api-service/app.py:143-148,179-186`: 300 s `setex`
  * keyed by query shape).
  *
  * Instead of serializing result JSON to an external store, the engine
  * pins the result DataFrame in Spark's block manager (`persist`), which
  * scales with the cluster and keeps lineage for recomputation on executor
  * loss. Entries auto-expire after `ttl` — expired entries are unpersisted
  * lazily on next access. The clock is injectable for tests.
  */
final class ResultCache(
    ttlMillis: Long = 300000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(df: DataFrame, deadline: Long)
  private val entries = TrieMap.empty[String, Entry]

  /** Get the cached DataFrame for `key`, or build + persist + register it.
    * Synchronized: concurrent cold-key callers would otherwise both build,
    * and the overwritten entry's blocks would stay persisted forever. */
  def getOrBuild(key: String)(build: => DataFrame): DataFrame = synchronized {
    val now = clock()
    entries.get(key) match {
      case Some(e) if e.deadline > now => e.df
      case stale =>
        stale.foreach(_.df.unpersist(blocking = false))
        val df = build.persist()
        entries.put(key, Entry(df, now + ttlMillis))
        df
    }
  }

  def contains(key: String): Boolean =
    entries.get(key).exists(_.deadline > clock())

  /** Synchronized with getOrBuild: an unsynchronized remove could race a
    * concurrent build's put and drop the entry without unpersisting it —
    * the exact block leak getOrBuild's lock exists to prevent. */
  def invalidate(key: String): Unit = synchronized {
    entries.remove(key).foreach(_.df.unpersist(blocking = false))
  }

  def clear(): Unit = synchronized {
    entries.keys.foreach(k =>
      entries.remove(k).foreach(_.df.unpersist(blocking = false)))
    entries.clear()
  }
}
