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
  * plan has a pending consumer. Lineage is always kept, so a release
  * that races a straggling consumer degrades to recompute, never to a
  * wrong result. Thread-safe; single-session scope (the frames
  * themselves pin their own session).
  */
object CacheScope {

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** `df.persist()` + register for the next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  /** Register an ALREADY-persisted frame (e.g. one materialized inside
    * an iterative loop) for the next [[releaseAll]] without touching
    * its storage level or computed blocks. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    tracked.add(ds)
    ds
  }

  /** Unpersist (non-blocking) and forget every registered frame. */
  def releaseAll(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      d.unpersist(false)
      d = tracked.poll()
    }
  }

  /** Registered-but-unreleased count (spec hook). */
  def pending: Int = tracked.size()
}
