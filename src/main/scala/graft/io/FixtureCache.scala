package graft.io

/** Process-wide memo for values derived from a fixture table file,
  * keyed by the file's (path, mtime, size) — so regenerating the data
  * under the same path invalidates the entry instead of silently
  * serving stale results (a plain path-keyed cache would). Entries are
  * small derived artifacts (k·d init centers, an index handle, a temp
  * dir path), never table-sized data. */
object FixtureCache {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long, Long), Any]

  def memo[T](tag: String, sfDir: String, table: String)(compute: => T): T = {
    val f = new java.io.File(Tables.path(sfDir, table))
    val key = (tag, f.getAbsolutePath, f.lastModified, f.length)
    cache.getOrElseUpdate(key, compute).asInstanceOf[T]
  }

  /** Stable unique key for a session, for memo tags that cache
    * session-bound values (persisted DataFrames bind to the session
    * that built them): one minted UUID per live session, weakly held.
    * Unlike `System.identityHashCode`, a UUID is never reused — an
    * identity hash can collide with a fresh session after the old one
    * is GC'd, serving a cached frame bound to a stopped session
    * (r9 ADVICE). (Spark's own `sessionUUID` is `private[sql]`.) */
  def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    sessionKeys.synchronized {
      var k = sessionKeys.get(s)
      if (k == null) { k = java.util.UUID.randomUUID.toString; sessionKeys.put(s, k) }
      k
    }
  private val sessionKeys =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]
}
