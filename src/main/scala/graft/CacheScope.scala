package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Registry for persisted intermediates whose lifetime must outlive the
  * function that created them but not the session.
  *
  * The pattern: an operator persists a reused stage boundary (BM25
  * postings, DSIR features, curation stage frames) and RETURNS a lazy
  * plan over it — so an in-function `try/finally unpersist` (the
  * [[graft.sources.MaterializedAgg]] idiom, right when the consumers
  * complete inside the call) would evict the cache before the caller
  * ever materializes the result. Spark's CacheManager holds strong
  * references to persisted plans, so without an explicit release each
  * ad-hoc call leaks one cached frame for the life of the session —
  * bounded-size and MEMORY_AND_DISK-evictable, but a real leak in a
  * long-lived serving session or a per-micro-batch `foreachBatch` loop.
  *
  * Two release scopes, two boundary kinds:
  *
  *  - [[releaseAll]] drains only the CALLING THREAD's registrations —
  *    the MID-OPERATION boundary (a `foreachBatch` body releasing per
  *    micro-batch). Thread scoping is what makes concurrent operations
  *    in one JVM safe: two streams each releasing per micro-batch, or
  *    a future parallelized Verify, drain their OWN frames instead of
  *    evicting caches another operation is mid-consuming.
  *  - [[releaseAllThreads]] drains EVERY thread's registrations — the
  *    WHOLE-OPERATION boundary ([[Verify]] after a query's result
  *    materializes, [[Bench]] between queries), where by construction
  *    nothing is in flight. This is what reclaims frames persisted on
  *    streams' execution threads whose bodies never release (a query
  *    that starts a stream, drains it, and returns): thread-scoped
  *    release alone left those accumulating for the JVM's life —
  *    measured as a uniform late-suite bench inflation (evictions
  *    under storage-memory pressure) when first deployed without it.
  *
  * Lineage is always kept, so even a mis-scoped release degrades to
  * recompute, never to a wrong result.
  */
object CacheScope {

  private val tracked = new java.util.concurrent.ConcurrentHashMap[
    Long, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  /** Register under the calling thread, race-safe against a concurrent
    * [[releaseAllThreads]]: the releaser REMOVES a queue from the map
    * before draining it, so an add can land in a queue that is already
    * orphaned (drained and unreachable — the registration would leak
    * its frame forever). The re-check closes that window: if the map no
    * longer holds OUR queue after the add, either the releaser already
    * drained our frame (released at the boundary — consistent, lineage
    * recomputes) or we pull it back out and re-register in a fresh
    * queue. Lock-free, and the loop terminates because each retry means
    * one releaseAllThreads pass completed in between. */
  private def register(ds: Dataset[_]): Unit = {
    var done = false
    while (!done) {
      val tid = Thread.currentThread().getId
      val q = tracked.computeIfAbsent(tid,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]())
      q.add(ds)
      if (tracked.get(tid) eq q) done = true // visible to future releases
      else if (!q.remove(ds)) done = true // releaser drained it — released
      // else: orphaned before drain — we reclaimed the frame; retry
    }
  }

  /** `df.persist()` + register for release (this thread's next
    * [[releaseAll]], or any [[releaseAllThreads]]). */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    register(p)
    p
  }

  /** Register an ALREADY-persisted frame (e.g. one materialized inside
    * an iterative loop) without touching its storage level or computed
    * blocks. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    register(ds)
    ds
  }

  private def drain(
      q: java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]): Unit = {
    var d = q.poll()
    while (d != null) {
      d.unpersist(false)
      d = q.poll()
    }
  }

  /** Unpersist (non-blocking) and forget every frame registered by the
    * CALLING thread. Frames registered by other in-flight operations
    * (other threads) are untouched — the mid-operation boundary. */
  def releaseAll(): Unit = {
    val q = tracked.get(Thread.currentThread().getId)
    if (q != null) drain(q)
  }

  /** Unpersist and forget EVERY thread's registrations — the
    * whole-operation boundary (Verify per query, Bench between
    * queries), where by construction no registered plan has a pending
    * consumer on any thread. Also reclaims queues of dead threads.
    * Each queue is atomically REMOVED from the map before it is
    * drained (never drain-then-remove): a concurrent [[register]] that
    * raced onto the removed queue detects the orphaning and
    * re-registers, so no frame can silently leak in the window. */
  def releaseAllThreads(): Unit = {
    val keys = tracked.keySet().iterator()
    while (keys.hasNext) {
      val q = tracked.remove(keys.next())
      if (q != null) drain(q)
    }
  }

  /** Calling thread's registered-but-unreleased count (spec hook). */
  def pending: Int = {
    val q = tracked.get(Thread.currentThread().getId)
    if (q == null) 0 else q.size()
  }

  /** All threads' registered-but-unreleased count (spec hook). */
  def pendingAllThreads: Int = {
    var n = 0
    tracked.forEach((_, q) => n += q.size())
    n
  }
}
