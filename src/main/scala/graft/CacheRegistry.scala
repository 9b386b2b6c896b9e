package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Engine-wide tracked-persist registry: every internal `persist()` the
 * engine takes (dedup signature tables, the nested-orders fixture, any
 * operator-private cache) is registered here, so a library user has ONE
 * release point instead of a per-operator cleanup zoo. The returned
 * DataFrames are lazy, which is exactly why the operators cannot unpersist
 * them eagerly themselves — the caller decides when the outputs have been
 * consumed.
 *
 * The reference side-steps this class of lifecycle problem with per-swamp
 * hydrate/evict timers (reference: app/core/hydra/hydra.go swamp lifecycle,
 * docs/how-hydraide-works.md "memory-first, zero idle cost"); on Spark the
 * analogue is explicit: persist what is reused, release when done, and at
 * real cluster scale replace the persist with a materialized table write.
 */
object CacheRegistry {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
  private val hooks = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  /** Persist `df` at `level` and track the handle for [[releaseAll]].
    * IDEMPOTENT on plan identity: if an identical plan is already cached
    * (`storageLevel` consults the CacheManager's canonicalized lookup,
    * so a fresh Dataset over the same plan matches), the frame is
    * returned as-is — re-persisting would only log "Asked to cache
    * already cached data" and, for a cache someone ELSE owns, wrongly
    * enlist it for this registry's release. The common hit is benign by
    * design: Bench times each query twice and the second run re-tracks
    * the plans the first already cached (still released by the run-1
    * handle in [[releaseAll]]). */
  def track(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val p = df.persist(level)
      tracked.add(p)
      p
    }
  }

  /** Register a cleanup callback run by EVERY [[releaseAll]] — operators
    * that memoize cached frames (e.g. per-(session, dir) fixtures) hook
    * their memo invalidation here so a released cache is never handed
    * back. Hooks are PERSISTENT (not drained with the caches): register
    * once per memo site at object-init time, not per pipeline run —
    * per-run registration would accumulate closures for the JVM lifetime. */
  def onRelease(hook: () => Unit): Unit = hooks.add(hook)

  /** Number of currently tracked persisted handles (test observability). */
  def trackedCount: Int = tracked.size()

  /** Unpersist every tracked handle and run all registered cleanup hooks. */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(blocking = false); df = tracked.poll() }
    hooks.forEach(h => h())
  }
}
