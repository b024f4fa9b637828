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
}
