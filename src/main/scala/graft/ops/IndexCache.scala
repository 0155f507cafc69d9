package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Cache for REGISTRATION-TIME artifacts: structures a production deployment
  * materializes once when a dataset is registered and then probes per query —
  * the parent-child closure table (built "once at registration time",
  * [[ParentChild]]), the IVF coarse-quantizer index ([[Similarity.ivfIndex]]),
  * k-means centroids. Rebuilding them on every query call charges each probe
  * the full index-construction cost, which is not the steady-state a cluster
  * sustains (the same reasoning as the named-set key memoization in the
  * planner and the aggregate-table store in [[graft.CubeCatalog]]).
  *
  * Keys are (session, caller key); values are typically localCheckpointed
  * DataFrames (blocks pinned by the cached reference, released on
  * [[invalidate]]) or small driver-side arrays. `/flush` clears it along with
  * the catalog caches. Entries are per-session, so a stopped session's
  * entries are inert; invalidate() drops them.
  */
object IndexCache {
  private val cache = new ConcurrentHashMap[(String, String), AnyRef]()

  /** Memoized build: the first caller pays the construction cost, later
    * callers (same session + key) get the materialized artifact. */
  def memo[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T =
    cache.computeIfAbsent(
      (String.valueOf(System.identityHashCode(spark)), key),
      _ => build).asInstanceOf[T]

  def invalidate(): Unit = cache.clear()

  private[graft] def size: Int = cache.size()
}
