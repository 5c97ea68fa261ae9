package graft.ops

import org.apache.spark.sql.SparkSession

/** A per-SparkSession, per-path cache whose entries actually die with
  * the session.
  *
  * The r13 form was a bare `WeakHashMap[SparkSession, TrieMap[...]]` in
  * each call site — but the cached values (a `LogicalRelation`'s
  * `HadoopFsRelation`, a `DataFrame`) strongly reference their owning
  * session, so the value chain pinned the weak KEY and no entry could
  * ever be collected: a stopped session plus its `InMemoryFileIndex`
  * leaked for the JVM lifetime (r13 ADVICE). Weak keys alone cannot fix
  * a value→key strong reference; this helper evicts EXPLICITLY instead,
  * via a `SparkListener` fired on application end. The listener itself
  * is owned by the context's listener bus and is released when the
  * context stops, so it adds no pin of its own. (`SparkSession.stop()`
  * stops the underlying context, so application end IS session end for
  * every lifecycle this engine runs; sibling `newSession()` clones die
  * with the same context.)
  */
final class SessionCache[V] {

  private val cache = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[String, V]]

  /** The session's path-keyed map, creating (and wiring eviction) on
    * first access.
    */
  def forSession(s: SparkSession): scala.collection.concurrent.TrieMap[String, V] =
    cache.synchronized {
      var m = cache.get(s)
      if (m == null) {
        m = new scala.collection.concurrent.TrieMap[String, V]
        cache.put(s, m)
        try s.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                : Unit = {
              cache.synchronized { cache.remove(s) }
              ()
            }
          })
        catch {
          // context already stopped: nothing will ever fire — don't cache
          case _: IllegalStateException => cache.remove(s)
        }
      }
      m
    }

  /** Drop `path`'s entry in EVERY session's map — the write-site
    * invalidation hook (a level directory was just rewritten).
    */
  def invalidate(path: String): Unit = cache.synchronized {
    cache.values.forEach(m => { m.remove(path); () })
  }
}
