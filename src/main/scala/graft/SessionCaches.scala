package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Eviction for the session-keyed memo caches (resolved tables, media/
  * raster materializations, bucketed-once markers, catalog file
  * tables). The caches key by SparkSession so concurrent sessions
  * never cross, but a plain ConcurrentHashMap strongly retains a
  * STOPPED session — its context, resolved plans, file indexes — for
  * the JVM's life (round-6 advice). A WeakHashMap cannot fix this: the
  * cached DataFrames reference their session, so the value would pin
  * the weak key. Instead every cache access first drops entries whose
  * session's SparkContext has stopped — the restart scenario that
  * accumulates dead sessions (repeated GraftSession restarts, test
  * harnesses) is exactly the scenario that keeps accessing the caches,
  * so reclamation happens at the moment a new session takes over.
  * Sessions sharing a live context (newSession) are kept — they remain
  * usable.
  */
object SessionCaches {
  def evictStopped[K, V](m: ConcurrentHashMap[K, V])(
      session: K => SparkSession): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      if (session(it.next().getKey).sparkContext.isStopped) it.remove()
    }
  }
}
