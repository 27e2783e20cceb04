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
  * [[persist]] registers the frame; [[releaseAll]] unpersists and
  * forgets everything registered since the last release. Release points
  * sit at OPERATION boundaries — after a query's result materializes
  * ([[Verify]], [[Bench]]), after a micro-batch commits (the q208
  * streaming admission shape) — where by construction no registered
  * plan has a pending consumer.
  *
  * The registry is THREAD-scoped, not process-global: persists and the
  * matching releaseAll always happen on the operation's own driver-side
  * thread (Verify/Bench run queries on the main thread; a streaming
  * `foreachBatch` body persists and releases on its stream's execution
  * thread), so scoping by thread makes concurrent operations in one
  * JVM safe — two streams each calling releaseAll per micro-batch, or
  * a future parallelized Verify, drain only their OWN frames instead
  * of evicting caches another operation is mid-consuming. An operation
  * MUST release on the thread that persisted (true of every site; a
  * thread that dies unreleased leaks its queue until the thread is
  * GC'd). Lineage is always kept, so even a mis-scoped release
  * degrades to recompute, never to a wrong result.
  */
object CacheScope {

  private val tracked =
    new ThreadLocal[java.util.ArrayDeque[Dataset[_]]] {
      override def initialValue() = new java.util.ArrayDeque[Dataset[_]]()
    }

  /** `df.persist()` + register for this thread's next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.get.add(p)
    p
  }

  /** Register an ALREADY-persisted frame (e.g. one materialized inside
    * an iterative loop) for this thread's next [[releaseAll]] without
    * touching its storage level or computed blocks. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    tracked.get.add(ds)
    ds
  }

  /** Unpersist (non-blocking) and forget every frame registered by the
    * CALLING thread. Frames registered by other in-flight operations
    * (other threads) are untouched. */
  def releaseAll(): Unit = {
    val q = tracked.get
    var d = q.poll()
    while (d != null) {
      d.unpersist(false)
      d = q.poll()
    }
  }

  /** Calling thread's registered-but-unreleased count (spec hook). */
  def pending: Int = tracked.get.size()
}
