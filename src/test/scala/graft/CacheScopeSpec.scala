package graft

import org.apache.spark.sql.functions._

import graft.operators.Search

class CacheScopeSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffle exchange partitions"),
    (2L, "spark broadcast join strategy"),
    (3L, "window frames order rows"),
    (4L, "spark spark spark shuffle")).toDF("doc_id", "text")

  test("operator-internal caches register with CacheScope and a " +
    "release at the operation boundary drains them; released plans " +
    "recompute identically (lineage kept)") {
    CacheScope.releaseAll() // isolate from other suites' leftovers
    assert(CacheScope.pending == 0)
    val ranked = Search.rankBm25(corpus, "doc_id", "text", "spark", 3)
    val before = ranked.collect().toSeq
    // the BM25 postings frame registered during planning
    assert(CacheScope.pending > 0)
    CacheScope.releaseAll()
    assert(CacheScope.pending == 0)
    // release is a cache decision, never a semantic one: the SAME lazy
    // plan re-materializes from lineage with identical rows
    assert(ranked.collect().toSeq == before)
    // idempotent
    CacheScope.releaseAll()
    assert(CacheScope.pending == 0)
  }

  test("persist() via CacheScope actually caches (InMemoryRelation in " +
    "the consumer plan) until released") {
    CacheScope.releaseAll()
    // QueryExecution memoizes withCachedData, so probe with a FRESH
    // identical plan each time (CacheManager matches canonicalized)
    def probe: String = corpus.groupBy("text")
      .agg(count(lit(1)).as("n"))
      .queryExecution.withCachedData.toString
    CacheScope.persist(corpus.groupBy("text")
      .agg(count(lit(1)).as("n")))
    assert(probe.contains("InMemoryRelation"))
    CacheScope.releaseAll()
    assert(!probe.contains("InMemoryRelation"))
  }

  test("registry is thread-scoped: one operation's releaseAll never " +
    "drains frames another in-flight operation registered") {
    CacheScope.releaseAllThreads()
    CacheScope.persist(corpus.filter(col("doc_id") > 1))
    assert(CacheScope.pending == 1)
    // a concurrent operation (another thread) registers and releases
    // its own frames — ours must survive its boundary
    val other = new Thread(() => {
      CacheScope.persist(corpus.filter(col("doc_id") <= 1))
      assert(CacheScope.pending == 1) // sees only its own
      CacheScope.releaseAll()
      assert(CacheScope.pending == 0)
    })
    other.start(); other.join()
    assert(CacheScope.pending == 1) // untouched by the other thread
    CacheScope.releaseAll()
    assert(CacheScope.pending == 0)
  }

  test("releaseAllThreads (the whole-operation boundary) reclaims " +
    "frames persisted on OTHER threads — the streaming-execution-" +
    "thread shape a per-thread release would leak for the JVM's life") {
    CacheScope.releaseAllThreads()
    assert(CacheScope.pendingAllThreads == 0)
    // a stream's execution thread persists and exits without releasing
    val streamThread = new Thread(() =>
      CacheScope.persist(corpus.filter(col("doc_id") > 2)))
    streamThread.start(); streamThread.join()
    assert(CacheScope.pending == 0)          // not ours...
    assert(CacheScope.pendingAllThreads == 1) // ...but still live
    CacheScope.releaseAll()                   // thread-scoped: no-op here
    assert(CacheScope.pendingAllThreads == 1)
    CacheScope.releaseAllThreads()            // boundary drain reclaims
    assert(CacheScope.pendingAllThreads == 0)
  }

  test("register vs releaseAllThreads race: concurrent persists never " +
    "silently leak — every frame ends unpersisted after the final " +
    "boundary drain") {
    // The window under test: releaseAllThreads removes a queue from
    // the map, a racing persist() on another thread adds to that
    // now-orphaned queue, and (pre-fix) the frame was never released.
    // Stress it: workers persist while the main thread hammers the
    // boundary; afterwards ONE final drain must leave zero live
    // registrations and zero cached frames.
    CacheScope.releaseAllThreads()
    val frames = java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.sql.DataFrame]())
    val workers = (0 until 4).map { t =>
      new Thread(() => {
        var i = 0
        while (i < 100) {
          frames.add(CacheScope.persist(
            spark.range(t * 1000L + i, t * 1000L + i + 1).toDF("v")))
          i += 1
        }
      })
    }
    workers.foreach(_.start())
    // boundary hammer while the workers are mid-register
    var spins = 0
    while (workers.exists(_.isAlive) && spins < 100000) {
      CacheScope.releaseAllThreads(); spins += 1
    }
    workers.foreach(_.join())
    CacheScope.releaseAllThreads() // the final whole-operation drain
    assert(CacheScope.pendingAllThreads == 0)
    val leaked = new java.util.ArrayList[String]()
    frames.forEach(f =>
      if (f.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
        leaked.add(f.storageLevel.toString))
    assert(leaked.isEmpty,
      s"${leaked.size} of ${frames.size} frames still cached after the " +
        "final boundary drain — the orphaned-queue leak")
  }

  test("removeDupChunks materializes its chunk relation once through " +
    "CacheScope (count leg + flag leg share the tokenize stage) and " +
    "the operation boundary drains it") {
    CacheScope.releaseAll()
    val cleaned = operators.Dedup.removeDupChunks(
      corpus.withColumnRenamed("text", "body"), "doc_id", "body", m = 2)
    val rows = cleaned.collect()
    assert(rows.length == 4)
    assert(CacheScope.pending == 1) // exactly the shared chunk relation
    CacheScope.releaseAll()
    assert(CacheScope.pending == 0)
    // lineage kept: recompute matches
    assert(cleaned.collect().toSeq == rows.toSeq)
  }
}
