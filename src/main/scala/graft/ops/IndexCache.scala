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
  * Sessions are map keys in a [[java.util.WeakHashMap]] (identity semantics —
  * `SparkSession` does not override equals), so two live sessions can never
  * observe each other's artifacts. Note the weak key does NOT make entries
  * GC-eligible when a session is dropped: the cached values are mostly
  * DataFrames, and a DataFrame strongly references its SparkSession — the
  * classic value-refers-to-key WeakHashMap pitfall — so an entry pins its
  * own key and persists until an explicit [[invalidate]]. That is the
  * contract: `/flush` clears the calling session's entries along with the
  * catalog caches, and test teardown calls [[invalidate()]]. Values are
  * typically localCheckpointed DataFrames (blocks pinned by the cached
  * reference, released on invalidate) or small driver-side arrays.
  *
  * [[memo]] deliberately does NOT use `ConcurrentHashMap.computeIfAbsent`:
  * artifact builders compose (the LSH cluster table is built FROM the
  * memoized LSH pair list), and the CHM contract forbids a mapping function
  * from touching other mappings of the same map — a nested computeIfAbsent
  * can throw `IllegalStateException("Recursive update")` when keys share a
  * bin. The get-then-putIfAbsent pattern below tolerates reentrancy; the
  * cost is that two racing first callers may both run `build` and one result
  * is discarded — acceptable for idempotent, side-effect-free index builds
  * (the winner's checkpoint is kept, the loser's blocks are GC-released).
  */
object IndexCache {
  private val sessions =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, AnyRef]]()

  private def mapFor(spark: SparkSession): ConcurrentHashMap[String, AnyRef] =
    sessions.synchronized {
      var m = sessions.get(spark)
      if (m == null) { m = new ConcurrentHashMap[String, AnyRef](); sessions.put(spark, m) }
      m
    }

  /** Memoized build: the first caller pays the construction cost, later
    * callers (same session + key) get the materialized artifact. Safe to
    * call from inside another memo's `build` (see class doc). */
  def memo[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val m = mapFor(spark)
    val hit = m.get(key)
    if (hit != null) return hit.asInstanceOf[T]
    val built = build
    val raced = m.putIfAbsent(key, built)
    (if (raced != null) raced else built).asInstanceOf[T]
  }

  /** Read one session's artifact without building (sibling lookup for
    * [[Forget]] — a clusters entry needs its pair list to re-cluster). */
  private[graft] def peek(spark: SparkSession, key: String): Option[AnyRef] =
    Option(mapFor(spark).get(key))

  /** Rewrite each of one session's artifacts IN PLACE (the `/forget`
    * path): `f` sees (key, value) and returns the replacement; returning
    * the same reference leaves the entry untouched. Returns the number of
    * entries replaced.
    *
    * LOCK-FREE walk, deliberately: `f` runs eager Spark jobs (a
    * tombstone's stale-check count(), the localCheckpoint in
    * pqDelete/ivfDelete), so holding the map lock across the walk would
    * block every other transform for multiple job durations while memo()
    * builds bypass the lock anyway. Instead the key set is snapshotted,
    * each rewrite runs unlocked, and the result swaps in via
    * `replace(k, old, nv)` — a lost race (a concurrent transform replaced
    * the value first) re-applies `f` to the winner's value, which is
    * sound because every rewrite the library installs here is an
    * idempotent anti-join. Entries born DURING the walk may still be
    * missed — quiesce ingest around a delete batch, the same operational
    * rule every tombstone op in the library states. */
  def transformEntries(spark: SparkSession)(
      f: (String, AnyRef) => AnyRef): Int = {
    val m = mapFor(spark)
    var replaced = 0
    val keys = new java.util.ArrayList[String](m.keySet())
    keys.forEach { k =>
      var done = false
      while (!done) {
        val v = m.get(k)
        if (v == null) done = true // removed concurrently (flush)
        else {
          val nv = f(k, v)
          if (nv eq v) done = true
          else if (m.replace(k, v, nv)) { replaced += 1; done = true }
          // else: a racing transform won — loop and rewrite its value
        }
      }
    }
    replaced
  }

  // Per-session registry of PERSISTED index layouts (path → kind) the
  // session has saved or loaded: [[Forget.forget]] walks it so a
  // right-to-be-forgotten request reaches the durable copies, not just
  // the in-memory artifacts — without it an index saved via
  // saveLshIndex/savePqIndex/saveIvfIndex and re-loaded after a forget
  // would resurrect the forgotten doc's rows. Lifecycle matches the
  // artifact map exactly (cleared by the same invalidate): the registry
  // tracks the session's standing registrations, and a layout saved by a
  // session that has since flushed is re-registered on its next load.
  private val persisted =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, String]]()

  private[graft] def registerPersisted(spark: SparkSession, path: String,
      kind: String): Unit =
    sessions.synchronized {
      var m = persisted.get(spark)
      if (m == null) {
        m = new ConcurrentHashMap[String, String](); persisted.put(spark, m)
      }
      m.put(path, kind)
    }

  /** Drop one path from the session's persisted registry (the compaction
    * staging dir must not outlive its swap). */
  private[graft] def unregisterPersisted(spark: SparkSession,
      path: String): Unit =
    sessions.synchronized {
      val m = persisted.get(spark)
      if (m != null) m.remove(path)
    }

  /** The session's registered persisted layouts, path → kind. */
  private[graft] def persistedPaths(spark: SparkSession): Map[String, String] =
    sessions.synchronized {
      val m = persisted.get(spark)
      if (m == null) Map.empty
      else {
        val b = Map.newBuilder[String, String]
        m.forEach((p, k) => b += (p -> k))
        b.result()
      }
    }

  /** Drop one session's artifacts (the `/flush` path). Other sessions'
    * entries are untouched. */
  def invalidate(spark: SparkSession): Unit =
    sessions.synchronized {
      val m = sessions.get(spark)
      if (m != null) m.clear()
      val p = persisted.get(spark)
      if (p != null) p.clear()
    }

  /** Drop everything (test teardown / catalog-wide flush). */
  def invalidate(): Unit = sessions.synchronized {
    sessions.clear(); persisted.clear()
  }

  private[graft] def size: Int =
    sessions.synchronized {
      var n = 0
      sessions.values().forEach(m => n += m.size())
      n
    }
}
