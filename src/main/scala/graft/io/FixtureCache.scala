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
    * (r9 ADVICE). (Spark's own `sessionUUID` is `private[sql]`.)
    *
    * EVICTION (r13 ADVICE): a session-bound memo value strongly
    * references its SparkSession, so the entry must not outlive the
    * session — otherwise stopped-session frames accumulate for the
    * process lifetime (and pin their sessions against GC). Callers
    * embed this key IN the memo tag (the `dedup_sem_pairs` /
    * `ann_margin_*_pairs` convention); the first mint for a session
    * registers a listener on its SparkContext that drops every entry
    * whose tag embeds the key when the context stops (the frames
    * themselves die with the context — only the map references need
    * releasing). */
  def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    sessionKeys.synchronized {
      var k = sessionKeys.get(s)
      if (k == null) {
        k = java.util.UUID.randomUUID.toString
        sessionKeys.put(s, k)
        val minted = k
        s.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
              evictSession(minted)
          })
      }
      k
    }

  /** Drop every memo entry whose tag embeds `key` (minted by
    * [[sessionKey]]). Idempotent; also callable directly by tests. */
  def evictSession(key: String): Unit =
    cache.keys.foreach { k => if (k._1.contains(key)) cache.remove(k) }

  private val sessionKeys =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]
}
